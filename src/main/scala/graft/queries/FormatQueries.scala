package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.formats.Decoders
import graft.functions.AvroExpressions
import graft.sinks.DocumentSink
import graft.sources.Tables

/** Wire-format decode + sink round-trip queries (SURVEY.md §2.2 F1–F9,
  * §2.9 W1). Each query synthesizes the wire payload deterministically
  * from a test table, runs the engine's decoder, and projects the decoded
  * fields; the oracle recomputes the expected fields relationally — so the
  * decode path is checked end-to-end without DuckDB needing the codec.
  */
object FormatQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val customerAvro =
    """{"type":"record","name":"c","fields":[
      {"name":"c_custkey","type":"long"},
      {"name":"c_name","type":"string"},
      {"name":"c_nationkey","type":"int"},
      {"name":"c_acctbal","type":"double"}]}"""

  private val supplierAvro =
    """{"type":"record","name":"s","fields":[
      {"name":"s_suppkey","type":"long"},
      {"name":"s_name","type":"string"},
      {"name":"s_acctbal","type":"double"}]}"""

  val all: Seq[QueryDef] = Seq(

    // F3 csv: encode customer rows as csv lines, decode with the declared
    // schema, project the decoded fields — exact round-trip.
    QueryDef(
      "q70_csv_decode",
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer ORDER BY c_custkey"""),
      (s, dir) => {
        val src = t(s, dir, "customer").select(
          concat_ws(",", col("c_custkey"), col("c_name"),
            col("c_nationkey"), col("c_acctbal")).cast("binary").as("value"))
        Decoders.decode(src, "value", Some("csv"), Some(customerAvro))
          .orderBy(col("c_custkey"))
      }),

    // F4 tsv
    QueryDef(
      "q71_tsv_decode",
      Some("""SELECT s_suppkey, s_name, s_acctbal
        FROM supplier ORDER BY s_suppkey"""),
      (s, dir) => {
        val src = t(s, dir, "supplier").select(
          concat_ws("\t", col("s_suppkey"), col("s_name"),
            col("s_acctbal")).cast("binary").as("value"))
        Decoders.decode(src, "value", Some("tsv"), Some(supplierAvro))
          .orderBy(col("s_suppkey"))
      }),

    // F2 text (+ F1/F6 binary is the identity version, unit-tested)
    QueryDef(
      "q72_text_decode",
      Some("""SELECT event_id, props AS message, CAST(LENGTH(props) AS INT) AS msg_len
        FROM events ORDER BY event_id"""),
      (s, dir) => {
        val src = t(s, dir, "events")
          .select(col("event_id"), col("props").cast("binary").as("value"))
        Decoders.decode(src, "value", Some("text"))
          .withColumn("msg_len", length(col("message")))
          .orderBy(col("event_id"))
      }),

    // F7 clf: synthesize Apache log lines from events, decode, compare
    // against the relational recomputation.
    QueryDef(
      "q73_clf_decode",
      Some("""SELECT event_id,
        '10.0.0.' || CAST(user_id % 250 AS VARCHAR) AS host,
        'frank' AS authuser,
        'GET /' || event_type || ' HTTP/1.1' AS request,
        CAST(200 + event_id % 3 AS INT) AS status,
        CAST(event_id % 1000 AS INT) AS bytes
        FROM events ORDER BY event_id"""),
      (s, dir) => {
        val line = concat(
          lit("10.0.0."), (col("user_id") % 250).cast("string"),
          lit(" - frank [01/Jan/2024:00:00:00 +0000] \"GET /"),
          col("event_type"), lit(" HTTP/1.1\" "),
          (lit(200) + col("event_id") % 3).cast("string"), lit(" "),
          (col("event_id") % 1000).cast("string"))
        val src = t(s, dir, "events")
          .select(col("event_id"), line.cast("binary").as("value"))
        Decoders.decode(src, "value", Some("clf"))
          .select(col("event_id"), col("host"), col("authuser"), col("request"),
            col("status").cast("int").as("status"),
            col("bytes").cast("int").as("bytes"))
          .orderBy(col("event_id"))
      }),

    // F8 grok
    QueryDef(
      "q74_grok_decode",
      Some("""SELECT event_id,
        '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.1' AS client,
        UPPER(event_type) AS method,
        CAST(event_id % 5000 AS INT) AS duration
        FROM events ORDER BY event_id"""),
      (s, dir) => {
        val line = concat(
          lit("10."), (col("user_id") % 200).cast("string"), lit(".0.1 "),
          upper(col("event_type")), lit(" "),
          (col("event_id") % 5000).cast("string"))
        val src = t(s, dir, "events")
          .select(col("event_id"), line.cast("binary").as("value"))
        Decoders.decode(src, "value", Some("grok"),
          options = Map("grok.pattern" -> "%{IP:client} %{WORD:method} %{INT:duration}"))
          .select(col("event_id"), col("client"), col("method"),
            col("duration").cast("int").as("duration"))
          .orderBy(col("event_id"))
      }),

    // F9 syslog (RFC-3164)
    QueryDef(
      "q75_syslog_decode",
      Some("""SELECT event_id,
        CAST(user_id % 24 AS INT) AS facility,
        CAST(event_id % 8 AS INT) AS severity,
        'host' || CAST(user_id AS VARCHAR) AS host,
        'app' AS tag,
        CAST(event_id % 100 AS INT) AS pid,
        'type=' || event_type AS msg
        FROM events ORDER BY event_id"""),
      (s, dir) => {
        val line = concat(
          lit("<"), (lit(8) * (col("user_id") % 24) + col("event_id") % 8).cast("string"),
          lit(">Jan  5 10:00:00 host"), col("user_id").cast("string"),
          lit(" app["), (col("event_id") % 100).cast("string"),
          lit("]: type="), col("event_type"))
        val src = t(s, dir, "events")
          .select(col("event_id"), line.cast("binary").as("value"))
        Decoders.decode(src, "value", Some("syslog"))
          .select(col("event_id"),
            col("facility").cast("int").as("facility"),
            col("severity").cast("int").as("severity"),
            col("host"), col("tag"),
            col("pid").cast("int").as("pid"), col("msg"))
          .orderBy(col("event_id"))
      }),

    // F5 avro: encode each row with the native expression, decode it back —
    // proves both directions without DuckDB touching avro.
    QueryDef(
      "q76_avro_roundtrip",
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer ORDER BY c_custkey"""),
      (s, dir) => {
        val src = t(s, dir, "customer").select(
          AvroExpressions.to_avro_graft(
            struct(col("c_custkey"), col("c_name"), col("c_nationkey"),
              col("c_acctbal")), customerAvro).as("value"))
        Decoders.decode(src, "value", Some("avro"), Some(customerAvro))
          .orderBy(col("c_custkey"))
      }),

    // W1 keyed document sink: write part as keyed JSON documents, read the
    // documents back, and check the key hoist + body against the source.
    // F1 raw / null-schema mode (reference MapRStreamConfig.java:83: absent
    // schema → the payload lands in a single default field; widget default
    // `MapRStream-streamingsource.json:70-79`). The engine's raw mode is
    // format = None → one binary `message` column; the query proves the
    // bytes pass through untouched by hashing them against the source text.
    QueryDef(
      "q78_raw_decode",
      Some("""SELECT event_id, props AS message_text,
          sha256(props) AS payload_hash
        FROM events ORDER BY event_id"""),
      (s, dir) => {
        val src = t(s, dir, "events").select(col("event_id"),
          col("props").cast("binary").as("value"))
        Decoders.decode(src, "value", format = None)
          .select(col("event_id"),
            col("message").cast("string").as("message_text"),
            sha2(col("message"), 256).as("payload_hash"))
          .orderBy(col("event_id"))
      }),

    QueryDef(
      "q77_doc_sink_roundtrip",
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS _id, p_name, p_retailprice
        FROM part ORDER BY _id"""),
      (s, dir) => {
        // Through the DSv2 connector (format("graft-doc")): base write,
        // then an overlapping re-write of the same documents — the
        // snapshot must still equal the part table, which proves the
        // upsert-by-_id resolution inside an oracle-checked query.
        val sinkPath = QueryDef.materializePath(dir, "q77")
        val docs = t(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        graft.connector.GraftDoc.write(docs, "p_partkey", sinkPath, overwrite = true)
        graft.connector.GraftDoc.write(docs.filter(col("p_partkey") <= 100),
          "p_partkey", sinkPath)
        graft.connector.GraftDoc.snapshot(s, sinkPath).orderBy(col("_id"))
      }),

    // Tombstone deletes: write every part document, delete the keys
    // divisible by 7 (a distributed tombstone commit), and read the
    // snapshot — deleted keys must be gone, everything else intact. The
    // compliance flow for a keyed training corpus (logically gone at the
    // tombstone, physically purged by the next compaction; the spec
    // covers the purge half).
    QueryDef(
      "q79_doc_deletes",
      Some("""SELECT CAST(p_partkey AS VARCHAR) AS _id, p_name, p_retailprice
        FROM part WHERE p_partkey % 7 <> 0 ORDER BY _id"""),
      (s, dir) => {
        val sinkPath = QueryDef.materializePath(dir, "q79")
        val docs = t(s, dir, "part")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        graft.connector.GraftDoc.write(docs, "p_partkey", sinkPath, overwrite = true)
        graft.connector.GraftDoc.delete(s, sinkPath,
          docs.filter(pmod(col("p_partkey"), lit(7)) === 0).select("p_partkey"))
        graft.connector.GraftDoc.snapshot(s, sinkPath).orderBy(col("_id"))
      }),

    // Payload-column file skipping (round 16): the writer declares
    // `statsColumns`, so each part file's manifest entry carries per-
    // column min/max for the declared payload columns — the Delta/
    // Iceberg-class extension beyond `_id`. Documents land SORTED by
    // lang with small target files (each file spans a narrow lang
    // range), and the raw scan under a `lang = 'es'` predicate prunes
    // every non-overlapping file at PLANNING time (PlanSpec pins the
    // files-read drop and the PushedFilters surface; the predicate is
    // also residual, so pruning can never change results — which is
    // what this oracle certifies through the aggregate).
    QueryDef(
      "qd6_doc_payload_stats_skip",
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE lang = 'es' GROUP BY lang ORDER BY lang"""),
      (s, dir) => {
        val sinkPath = QueryDef.materializePath(dir, "qd6")
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("lang"), col("doc_id"))
        graft.connector.GraftDoc.write(docs, "doc_id", sinkPath,
          overwrite = true, targetFileRows = Some(60L),
          statsColumns = Seq("lang", "n_chars"))
        s.read.format("graft-doc").load(sinkPath)
          .filter(col("lang") === "es")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"))
          .orderBy(col("lang"))
      })
  )
}

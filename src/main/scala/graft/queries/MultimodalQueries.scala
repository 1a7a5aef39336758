package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column operators (SURVEY.md §2.12, Tier C): media as opaque
  * `binary` payload columns + typed metadata, with decode / frame-sample
  * as deterministic stubs (no image/audio libs in this container — the
  * Spark-side plumbing is the deliverable; the stub marks the seam where a
  * real decoder drops in).
  *
  * The payload here is `encode(text)` because the test corpus has no real
  * media; the reference's own type bridge already moves opaque `bytes`
  * columns (`MapRDBJSONSink.java:250-266`), and everything below operates
  * on the bytes, not the text.
  *
  * Scale notes: all three queries are row-local until the final aggregation
  * or sort (no joins), so they scale with scan bandwidth. Real decoders
  * replace [[MultimodalQueries.decodeStub]]'s arithmetic inside the same
  * `mapPartitions` shape: batch-amortized init (codec tables, GPU handles)
  * happens once per partition, which is why the seam is mapPartitions and
  * not a per-row UDF.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** media row entering the decode stage: opaque payload + provenance. */
  final case class MediaIn(doc_id: Long, source: String, payload: Array[Byte])

  /** decode output: typed media metadata (deterministic fake). */
  final case class MediaMeta(doc_id: Long, source: String, byte_len: Long,
      width: Long, height: Long, n_frames: Long)

  /** STUB decoder — a real implementation would parse the container header
    * here (e.g. via javacv/ffmpeg); this fake derives dimensions from the
    * payload length so tests and the oracle stay deterministic. */
  def decodeStub(rows: Iterator[MediaIn]): Iterator[MediaMeta] = {
    // per-partition init of a (fake) codec happens here, once, not per row
    rows.map { m =>
      val n = m.payload.length.toLong
      MediaMeta(m.doc_id, m.source, n,
        width = 64L + n % 1216L,
        height = 64L + (n * 7L) % 1016L,
        n_frames = n / 16L)
    }
  }

  val all: Seq[QueryDef] = Seq(

    // Binary payload + flat metadata projection: checksum, size, fake
    // dimensions. Binary stays out of the compared projection (SURVEY.md
    // §7.4) — the sha256 hex string carries its identity.
    QueryDef(
      "q67_media_metadata",
      Some("""SELECT doc_id,
          octet_length(encode(text)) AS byte_len,
          sha256(text) AS checksum,
          64 + octet_length(encode(text)) % 1216 AS width,
          64 + (octet_length(encode(text)) * 7) % 1016 AS height
        FROM documents ORDER BY doc_id"""),
      (s, dir) =>
        docs(s, dir)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .select(
            col("doc_id"),
            octet_length(col("payload")).cast("long").as("byte_len"),
            sha2(col("payload"), 256).as("checksum"),
            (lit(64) + octet_length(col("payload")) % 1216).cast("long").as("width"),
            (lit(64) + (octet_length(col("payload")) * 7) % 1016).cast("long").as("height"))
          .orderBy(col("doc_id"))),

    // Frame sampling: treat the payload as 16-byte frames, keep every 4th,
    // checksum the sampled subsequence. Operates on the hex view so the
    // oracle (which lacks blob slicing) replays it exactly.
    QueryDef(
      "q68_frame_sample",
      Some("""WITH h AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) // 16 AS n_frames
        FROM documents)
        SELECT doc_id, n_frames,
          (n_frames + 3) // 4 AS n_sampled,
          sha256(array_to_string(list_transform(
            generate_series(0, CAST((n_frames + 3) // 4 AS INT) - 1),
            j -> substring(hx, j * 128 + 1, 32)), '')) AS sample_checksum
        FROM h WHERE n_frames > 0 ORDER BY doc_id"""),
      (s, dir) =>
        docs(s, dir)
          .withColumn("hx", hex(encode(col("text"), "UTF-8")))
          .withColumn("n_frames", (octet_length(col("hx")) / lit(2) / lit(16)).cast("long"))
          .filter(col("n_frames") > 0)
          .withColumn("n_sampled", ((col("n_frames") + 3) / 4).cast("long"))
          .select(
            col("doc_id"), col("n_frames"), col("n_sampled"),
            sha2(concat_ws("", transform(
              sequence(lit(0), (col("n_sampled") - 1).cast("int")),
              j => col("hx").substr(j * 128 + 1, lit(32)))), 256).as("sample_checksum"))
          .orderBy(col("doc_id"))),

    // The mapPartitions decode seam, end to end: binary in → typed metadata
    // out → relational aggregation over the decoded struct. The oracle
    // replays the stub's arithmetic from octet_length, proving the typed
    // plumbing (encoders, batch shape, partition amortization) is lossless.
    QueryDef(
      "q69_decode_stub",
      Some("""WITH m AS (
        SELECT doc_id, source, octet_length(encode(text)) AS n FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(n // 16) AS BIGINT) AS total_frames,
          CAST(max(64 + n % 1216) AS BIGINT) AS max_width
        FROM m GROUP BY source ORDER BY source"""),
      (s, dir) => {
        import s.implicits._
        val decoded = docs(s, dir)
          .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
          .as[MediaIn]
          .mapPartitions(decodeStub)
        decoded.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_frames")).as("total_frames"),
            max(col("width")).as("max_width"))
          .orderBy(col("source"))
      })
  )
}

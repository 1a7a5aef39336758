package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Keyed JSON-document sink — SURVEY.md §2.9 W1, parity with the
  * reference's MapRDB JSON sink (`MapRDBJSONSink.java:118-147`):
  *
  *   - one config-named key field becomes the document `_id`
  *     (reference `:140-144`; docs restrict the id to string,
  *     `docs/MapRDBJSON-batchsink.md:12-13` — we cast accordingly);
  *   - the key field is hoisted OUT of the document body
  *     (the `if (isIdField) break` arms, `:157-270`);
  *   - null fields are omitted from the document
  *     (`:131` null guard → `ignoreNullFields` on the JSON writer).
  *
  * The reference assembles documents reflectively per record; here the
  * whole transform is three Catalyst expressions and the write is Spark's
  * distributed JSON/Parquet writer. At 100 TB the `_id` hoist is a pure
  * projection (no shuffle); writers scale with input partitions. A real
  * KV target would swap the file writer for a DataSource V2 `Table` with
  * the same `toDocuments` projection on top.
  */
object DocumentSink {

  /** Project a DataFrame into keyed-document shape: `_id` (string) first,
    * then the body (key field dropped, mirroring the reference). */
  def toDocuments(df: DataFrame, keyField: String,
      dropKeyFromBody: Boolean = true): DataFrame = {
    require(df.columns.contains(keyField), s"key field $keyField missing")
    val body = df.columns.filter(c => !dropKeyFromBody || c != keyField)
    df.select((col(keyField).cast("string").as("_id") +: body.map(col)): _*)
  }

  /** Batch write as JSON documents (nulls omitted, reference `:131`).
    *
    * @param targetFileRows cap on rows per output file (small-files
    *   control: at 100 TB an unbounded writer fans out one file per task,
    *   and a later repartition stage would shuffle the world; capping via
    *   `maxRecordsPerFile` splits inside each task instead — no shuffle).
    */
  def write(df: DataFrame, keyField: String, path: String,
      format: String = "json", mode: String = "overwrite",
      targetFileRows: Option[Long] = None): Unit = {
    val docs = toDocuments(df, keyField)
    val w0 = docs.write.mode(mode)
    val w = targetFileRows.fold(w0)(n => w0.option("maxRecordsPerFile", n))
    format match {
      case "json" => w.option("ignoreNullFields", "true").json(path)
      case "parquet" => w.parquet(path)
      case other => throw new IllegalArgumentException(s"unsupported sink format $other")
    }
  }

  /** Streaming variant via foreachBatch — the Structured Streaming
    * equivalent of the reference's per-micro-batch sink write. Exactly-once
    * to an idempotent keyed store via `_id` upsert; at-least-once to files. */
  def writeStream(df: DataFrame, keyField: String, path: String,
      checkpoint: String, format: String = "json"): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        write(batch, keyField, s"$path/batch_$batchId", format, "overwrite")
      }
      .start()
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Batch table access for the engine (SURVEY.md §2.1 S6).
  *
  * The reference's only source is a stream; our batch spine is columnar
  * Parquet via Spark's DataSource V2 path, which gives vectorized scan,
  * predicate pushdown, and column pruning for free. Every relational query in
  * [[graft.SparkEntry]] reads through here.
  *
  * Lineage/catalog parity (reference `ReferenceStreamingSource.java:43-44`,
  * `MapRStreamingSource.java:71` register an external dataset per
  * referenceName): [[registerAll]] registers each table as a temp view under
  * its reference name so SQL and lineage listeners see stable names.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** Normalize the events table to the engine's canonical shape: `ts` as a
    * µs TimestampType for calendar ops, `ts_ns` as exact epoch nanos
    * (BIGINT) for ordering and gap arithmetic that must match the oracle's
    * `epoch_ns(ts)`. Handles both fixture vintages:
    *   - parquet TIMESTAMP(NANOS): Spark has no ns timestamp type, so the
    *     session reads it as long nanos (spark.sql.legacy.parquet
    *     .nanosAsLong) and `ts` is derived by truncation;
    *   - parquet TIMESTAMP(MICROS) (current driver testdata): read as
    *     TIMESTAMP_NTZ, `ts_ns` derived as unix_micros × 1000 (exact — the
    *     file has nothing below µs). Session TZ is pinned UTC
    *     ([[graft.GraftSession]]), so the NTZ→TZ cast is the identity on
    *     the underlying micros, same as DuckDB's naive-as-UTC epoch_ns. */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        df.withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000"))
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    }

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

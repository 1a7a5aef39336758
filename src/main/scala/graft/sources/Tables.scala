package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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
    // events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    // timestamp type, so the session reads it as long nanos
    // (spark.sql.legacy.parquet.nanosAsLong). Expose both: `ts` as a µs
    // TimestampType for calendar ops, `ts_ns` as exact nanos for ordering
    // and gap arithmetic that must match the ns-precision oracle.
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else df
  }

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}

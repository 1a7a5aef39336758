package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference (see SURVEY.md §0) delegates all execution to its host
  * platform; our engine delegates to Spark/Catalyst/Tungsten and tunes the
  * knobs that matter at 100 TB:
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *     and join-strategy re-planning replace any hand-scheduling.
  *   - shuffle.partitions sized to the local core count for tests; on a real
  *     cluster this is set per-job (or left to AQE's coalescing with a high
  *     initial partition number).
  *   - UTC session TZ pinned so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {

  /** Apply engine defaults to a builder (caller controls master/memory). */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.filterPushdown", "true")
    // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    // default; read as long nanos and normalize in Tables.load.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
    // one-shot AvailableNow drains don't benefit from aggressive state-store
    // housekeeping; long maintenance pauses showed up as multi-10s outliers
    .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    .config("spark.sql.streaming.minBatchesToRetain", "2")
    .config("spark.sql.ui.explainMode", "formatted")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

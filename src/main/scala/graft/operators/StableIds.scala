package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering: assign ids equal to `row_number()
  * over a TOTAL sort` — without the single-task global window that
  * expression actually plans (every row through one task: the q0d
  * scale-killer), and without `monotonically_increasing_id` (stable only
  * for one physical partitioning, gaps of 2^33 between partitions).
  *
  * The classic two-phase pattern, kept declarative:
  *   1. range partition + sort within partitions by the key — Spark's
  *      RangePartitioner guarantees every row of partition i orders
  *      before every row of partition i+1;
  *   2. count rows per physical partition (a #partitions-row table);
  *   3. cumulative offsets over that TINY table via a triangular
  *      self-join (sum of counts of lower partition ids) — deliberately
  *      not a global window, so a plan gate can assert the whole
  *      operator contains ZERO empty-partitioning windows;
  *   4. id = partition offset + intra-partition rank (a window
  *      PARTITIONED by the physical partition id — parallel by
  *      construction).
  *
  * The assignment equals the total-sort numbering REGARDLESS of where
  * the sampled range boundaries land (offsets are computed from actual
  * counts), so the result is deterministic for a deterministic
  * `orderKeys`. `orderKeys` must be a total order (include a unique
  * tiebreaker) — equal keys across a partition boundary would otherwise
  * make the numbering boundary-dependent.
  */
object StableIds {

  def assign(df: DataFrame, orderKeys: Seq[Column], partitions: Int,
      idCol: String = "stable_id"): DataFrame = {
    require(orderKeys.nonEmpty, "orderKeys must be non-empty")
    // localCheckpoint is CORRECTNESS here, not lineage hygiene: the ranged
    // table feeds two jobs (the per-partition counts and the final join),
    // and `spark_partition_id()` is only meaningful if both see the same
    // physical partitioning. Without pinning, AQE may re-plan the range
    // exchange differently per job (local/split shuffle reads), skewing
    // pids between the offsets table and the rows they offset — observed
    // at 2M rows (ScaleProbe `prefixsum`, wrong totals), invisible at
    // spec scale. Materializing once is the operator's inherent cost: the
    // numbered corpus is what it exists to produce.
    val ranged = df
      .repartitionByRange(partitions, orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
      .withColumn("_sid_pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("_sid_pid"))
      .agg(count(lit(1)).as("_sid_cnt"))
    // cumulative offset of partition p = sum of counts of partitions < p;
    // triangular self-join over the #partitions-row table (not a global
    // window — see scaladoc)
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b._sid_pid") < col("a._sid_pid"), "left")
      .groupBy(col("a._sid_pid").as("_sid_pid"))
      .agg(coalesce(sum(col("b._sid_cnt")), lit(0L)).as("_sid_off"))
    val wLocal = Window.partitionBy(col("_sid_pid"))
      .orderBy(orderKeys: _*)
    ranged
      .join(broadcast(offsets), Seq("_sid_pid"))
      .withColumn(idCol,
        col("_sid_off") + row_number().over(wLocal).cast("long"))
      .drop("_sid_pid", "_sid_off")
  }

  /** Scale-safe EXCLUSIVE prefix sum over a total order: for each row, the
    * sum of `value` over all rows strictly before it — the generalization
    * of [[assign]] (which is the prefix sum of `value = 1`, shifted by
    * one). `SUM(x) OVER (ORDER BY …)` plans the same single-task
    * empty-partitioning window as global `row_number()`, so the same
    * two-phase shape applies: range partition + per-partition TOTALS
    * (a #partitions-row table), triangular-self-join offsets, and a local
    * running sum windowed BY the physical partition id. Same
    * boundary-independence argument: offsets are actual per-partition
    * sums, so the result equals the single-node running total wherever
    * the sampled range boundaries land. `value` must be integral
    * (cast to long); `orderKeys` must be a total order. */
  def runningTotal(df: DataFrame, orderKeys: Seq[Column], value: Column,
      partitions: Int, outCol: String = "running_before"): DataFrame = {
    require(orderKeys.nonEmpty, "orderKeys must be non-empty")
    // same pid-consistency pin as in assign (see the comment there)
    val ranged = df
      .repartitionByRange(partitions, orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
      .withColumn("_sid_pid", spark_partition_id())
      .withColumn("_sid_v", value.cast("long"))
      .localCheckpoint()
    val sums = ranged.groupBy(col("_sid_pid"))
      .agg(sum(col("_sid_v")).as("_sid_cnt"))
    val offsets = sums.as("a")
      .join(sums.as("b"), col("b._sid_pid") < col("a._sid_pid"), "left")
      .groupBy(col("a._sid_pid").as("_sid_pid"))
      .agg(coalesce(sum(col("b._sid_cnt")), lit(0L)).as("_sid_off"))
    val wLocal = Window.partitionBy(col("_sid_pid"))
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(offsets), Seq("_sid_pid"))
      .withColumn(outCol,
        col("_sid_off") + coalesce(sum(col("_sid_v")).over(wLocal), lit(0L)))
      .drop("_sid_pid", "_sid_off", "_sid_v")
  }

  /** Scale-safe INCLUSIVE running max over a total order — the watermark
    * shape: for each row, the max of `value` over all rows up to and
    * including it. Same two-phase plan as [[runningTotal]] with max as
    * the combine: range partition + per-partition maxima (a
    * #partitions-row table), triangular-self-join prefix maxima, and a
    * local running max windowed by the physical partition id; the result
    * equals the single-node running max wherever the sampled range
    * boundaries land. `value` must be integral (cast to long). */
  def runningMax(df: DataFrame, orderKeys: Seq[Column], value: Column,
      partitions: Int, outCol: String = "running_max"): DataFrame = {
    require(orderKeys.nonEmpty, "orderKeys must be non-empty")
    // same pid-consistency pin as in assign (see the comment there)
    val ranged = df
      .repartitionByRange(partitions, orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
      .withColumn("_sid_pid", spark_partition_id())
      .withColumn("_sid_v", value.cast("long"))
      .localCheckpoint()
    val maxs = ranged.groupBy(col("_sid_pid"))
      .agg(max(col("_sid_v")).as("_sid_m"))
    val offsets = maxs.as("a")
      .join(maxs.as("b"), col("b._sid_pid") < col("a._sid_pid"), "left")
      .groupBy(col("a._sid_pid").as("_sid_pid"))
      .agg(max(col("b._sid_m")).as("_sid_pre")) // null for the first pid
    val wLocal = Window.partitionBy(col("_sid_pid"))
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged
      .join(broadcast(offsets), Seq("_sid_pid"))
      .withColumn(outCol, greatest(max(col("_sid_v")).over(wLocal),
        coalesce(col("_sid_pre"), lit(Long.MinValue))))
      .drop("_sid_pid", "_sid_v", "_sid_pre")
  }
}

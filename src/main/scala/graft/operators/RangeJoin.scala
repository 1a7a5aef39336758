package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via fixed-width binning — the scale-safe
  * alternative to writing `p.ts >= iv.lo AND p.ts < iv.hi` as a raw join
  * condition (which, with no equi prefix, Spark can only plan as a
  * nested-loop over the cross product: O(|points|·|intervals|), a
  * scale-killer the moment the interval side outgrows a broadcast).
  *
  * The standard trick (Databricks' range-join optimization, Flink/Trino
  * interval joins): pick a bin width near the typical interval length,
  * explode each interval onto every bin it overlaps, map each point to
  * the single bin containing it, equi-join on the bin id, and re-check
  * the exact range as a residual filter. The join becomes a plain
  * shuffled hash join on an integer key:
  *
  *   - each (interval, point) pair meets in EXACTLY one bin (the point's
  *     bin), so no post-join dedup is needed;
  *   - cost is O(|points| + |intervals|·bins_per_interval) shuffled rows,
  *     and bins_per_interval = len/binWidth + 1 stays small when binWidth
  *     is chosen near the typical interval length;
  *   - both sides shuffle-partition by bin, so AQE's skew handling applies
  *     to hot bins exactly as it does to any hot hash key.
  *
  * Bin arithmetic is integer division on the raw long values (event-time
  * nanos here are ~1.7e18 — above 2^53, where a double `floor(x / w)`
  * would silently lose ulps and misplace bin boundaries).
  *
  * Contract: intervals are half-open `[lo, hi)`; empty intervals
  * (`hi <= lo`) are dropped up front (they can match nothing, and
  * `sequence(lo div w, (hi-1) div w)` would otherwise walk DOWNWARD and
  * fabricate bins). Degenerate inputs with intervals much longer than
  * `binWidth` still answer correctly — they just explode into
  * `len/binWidth` rows, which is the caller's dial to keep bounded.
  */
object RangeJoin {

  /** Inner-join `points` rows into the `intervals` rows whose
    * `[lo, hi)` range contains them. `lo`, `hi`, `pt` name long-typed
    * columns (same clock/units on both sides); output carries every
    * column of both inputs. Column name sets must be disjoint. */
  def pointInInterval(
      intervals: DataFrame, lo: String, hi: String,
      points: DataFrame, pt: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iv = intervals
      .filter(col(hi) > col(lo))
      .withColumn("_rj_bin",
        explode(sequence(
          expr(s"`$lo` div ${binWidth}L"),
          expr(s"(`$hi` - 1) div ${binWidth}L"))))
    val pts = points.withColumn("_rj_bin", expr(s"`$pt` div ${binWidth}L"))
    iv.join(pts, Seq("_rj_bin"))
      .filter(col(pt) >= col(lo) && col(pt) < col(hi))
      .drop("_rj_bin")
  }

  /** Interval×interval OVERLAP join via the same binning: emit each
    * `a`-row/`b`-row pair whose half-open ranges `[loA, hiA)` / `[loB,
    * hiB)` intersect. Unlike [[pointInInterval]], overlapping intervals
    * co-reside in EVERY bin their intersection spans, so the exactly-once
    * rule needs a tie-break: a pair is emitted only in the FIRST bin both
    * intervals cover. That bin is `max(bin(loA), bin(loB))` — overlap
    * means `max(loA, loB) < min(hiA, hiB)`, so the later-starting
    * interval's first bin is covered by both, and `bin` is monotone so
    * `bin(max(lo))` IS `max(bin(lo))`. The filter is a cheap residual on
    * already-joined rows; no post-join dedup/distinct (which would be a
    * second shuffle of the full pair set) is ever needed.
    *
    * Same contracts as [[pointInInterval]]: half-open ranges, empty
    * intervals dropped, integer `div` bin arithmetic, disjoint column
    * names, `binWidth` chosen near the typical interval length. */
  def intervalOverlap(
      a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(col(hi) > col(lo))
      .withColumn("_rj_bin",
        explode(sequence(
          expr(s"`$lo` div ${binWidth}L"),
          expr(s"(`$hi` - 1) div ${binWidth}L"))))
    binned(a, loA, hiA).join(binned(b, loB, hiB), Seq("_rj_bin"))
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .filter(col("_rj_bin") === greatest(
        expr(s"`$loA` div ${binWidth}L"), expr(s"`$loB` div ${binWidth}L")))
      .drop("_rj_bin")
  }
}

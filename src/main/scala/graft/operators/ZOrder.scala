package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * trick behind lakehouse OPTIMIZE ZORDER: a total sort can make file
  * min/max statistics tight in ONE column only (a range predicate on any
  * other column prunes nothing), while interleaving the bits of two key
  * columns makes every file's bounding box tight in BOTH — point/range
  * predicates on EITHER dimension skip most files at planning time.
  * At 100 TB this is a write-side operator: compute the z-value, range
  * partition on it, sort within partitions, write — scan-side pruning
  * then comes for free from ordinary parquet min/max stats.
  *
  * The z-value is pure integer bit arithmetic (no UDF — the fold below
  * builds one codegen'd expression of shifts/ands/adds), so it is exact,
  * engine-portable, and costs one projection.
  */
object ZOrder {

  /** Morton z-value interleaving the low `bits` bits of `x` (even bit
    * positions) and `y` (odd positions). Values ≥ 2^bits alias into the
    * same z-prefix — pick `bits` to cover the key domain. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }

  /** Normalize a column to fill the full `bits`-wide domain:
    * floor((c - lo) * (2^bits - 1) / (hi - lo)). MANDATORY before
    * interleaving columns of unequal ranges — raw interleave lets the
    * wider column's high bits outrank the narrower one's entirely (its
    * top bit sits at a higher z-position by construction), collapsing
    * the curve back to a single-column sort in the wide dimension.
    * The multiply stays ≪ 2^53, so the double floor-divide is exact. */
  def normalize(c: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      floor((c.cast("double") - lo) * ((1L << bits) - 1).toDouble /
        (hi.cast("double") - lo)).cast("long"))

  /** Write-side layout: normalize both keys to the common bit domain
    * (min/max ride as in-plan scalar subqueries — no driver collect),
    * range partition by z-value and sort within each partition, so every
    * output file covers one tight z-range — a tight bounding box in BOTH
    * `x` and `y`. The `_z` column is kept so callers can inspect/cluster
    * further; drop it before persisting if the storage schema must stay
    * unchanged. */
  def layout(df: DataFrame, x: String, y: String, bits: Int,
      partitions: Int): DataFrame = {
    // ONE stats subquery (a struct of all four bounds), referenced four
    // times — identical subqueries dedup to a single reused scan, where
    // four separate agg scalars would re-scan the input four times
    val st = df.agg(struct(
      min(col(x)).as("x0"), max(col(x)).as("x1"),
      min(col(y)).as("y0"), max(col(y)).as("y1")).as("st")).scalar()
    df.withColumn("_z", zValue(
        normalize(col(x), st.getField("x0"), st.getField("x1"), bits),
        normalize(col(y), st.getField("y0"), st.getField("y1"), bits), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
  }
}

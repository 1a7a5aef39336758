package graft

import org.apache.spark.sql.functions._
import graft.queries.Joins

/** qaj's contract, property-checked the way IncrementalMinhashPropSpec
  * pins qa8: folding ingest batches into the day-stats catalog
  * generation by generation must equal recomputing the stats from
  * scratch over the union — FRAME BY FRAME, on random corpora and
  * random splits, including the hard case where a day exists on only
  * one side of a merge (the full-outer's null arms). */
class IncrementalStatsPropSpec extends SparkSpec {

  test("merge chain equals from-scratch day stats on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    var oneSidedDays = 0L
    for (trial <- 1 to 5) {
      val n = 600 + rnd.nextInt(900)
      // sparse day domain so many days appear in only one generation
      val rows = (1 to n).map { i =>
        val day = rnd.nextInt(600)
        (i.toLong, java.sql.Date.valueOf(
          java.time.LocalDate.of(2021, 1, 1).plusDays(day.toLong)))
      }
      val df = rows.toDF("o_orderkey", "o_orderdate")
      val g = pmod(col("o_orderkey") + trial, lit(3L))
      val snap = Joins.ordersDayStats(df.filter(g === 0))
      val b1 = Joins.ordersDayStats(df.filter(g === 1))
      val b2 = Joins.ordersDayStats(df.filter(g === 2))
      val merged = Joins.mergeDayStats(Joins.mergeDayStats(snap, b1), b2)
      val rebuilt = Joins.ordersDayStats(df)
      assert(merged.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(merged).isEmpty,
        s"trial $trial: merged catalog != from-scratch stats")
      // count days the chain's first merge saw on only one side — the
      // null-arm path must actually be exercised, not vacuously green
      oneSidedDays += snap.withColumnRenamed("nco", "nco_a")
        .join(b1.withColumnRenamed("nco", "nco_b"),
          Seq("d", "mon"), "full_outer")
        .filter(col("nco_a").isNull || col("nco_b").isNull)
        .count()
    }
    assert(oneSidedDays > 0, "no one-sided day ever hit the merge")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Property contract for the binned range join: for random interval/point
  * sets and ANY bin width, `RangeJoin.pointInInterval` must produce
  * exactly the pairs the naive cross-join-filter semantics define — each
  * exactly once (a bin-explosion bug would duplicate pairs that straddle
  * bin boundaries; an off-by-one in `(hi-1) div w` would drop pairs whose
  * interval ends exactly on a boundary).
  */
class RangeJoinPropSpec extends SparkSpec {

  private def naive(iv: Seq[(Long, Long, Long)], pts: Seq[(Long, Long)]) =
    (for {
      (id, lo, hi) <- iv
      (pid, p) <- pts
      if p >= lo && p < hi
    } yield (id, pid)).sorted

  test("property: 12 random graphs of intervals x points match naive semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 12) {
      // mix of short and long intervals, including empty (hi <= lo) and
      // boundary-aligned ones; bin width varies per trial
      val binW = Seq(7L, 10L, 64L, 1000L)(trial % 4)
      val iv = (1 to 40).map { i =>
        val lo = rnd.nextInt(2000).toLong
        val len = rnd.nextInt(3 * binW.toInt) - binW / 2 // some empty
        (i.toLong, lo, lo + len)
      }
      val pts = (1 to 300).map(j => (j.toLong + 1000, rnd.nextInt(2200).toLong))
      val got = RangeJoin
        .pointInInterval(
          iv.toDF("iv_id", "lo", "hi"), "lo", "hi",
          pts.toDF("p_id", "p"), "p", binW)
        .select(col("iv_id"), col("p_id"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == naive(iv, pts), s"trial $trial (binW=$binW) diverged")
    }
  }

  test("pairs meeting exactly on a bin boundary appear exactly once") {
    import spark.implicits._
    // interval [90, 210) with binW=100 spans bins 0,1,2; points at the
    // boundaries 100 and 200 (in-range) and 210 (exactly hi: excluded)
    val iv = Seq((1L, 90L, 210L)).toDF("iv_id", "lo", "hi")
    val pts = Seq((1L, 100L), (2L, 200L), (3L, 210L), (4L, 89L))
      .toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(iv, "lo", "hi", pts, "p", 100L)
      .select(col("p_id")).as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L))
  }
}

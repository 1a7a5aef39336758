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

  private def naiveOverlap(a: Seq[(Long, Long, Long)],
      b: Seq[(Long, Long, Long)]) =
    (for {
      (aid, alo, ahi) <- a
      (bid, blo, bhi) <- b
      // empty intervals share no point with anything: the raw inequality
      // alone would call [5,3) "overlapping" [2,9), so guard both sides
      if ahi > alo && bhi > blo && alo < bhi && blo < ahi
    } yield (aid, bid)).sorted

  test("property: interval-overlap join matches naive semantics, each pair once") {
    import spark.implicits._
    // the exactly-once rule here is subtler than point-in-interval:
    // overlapping intervals CO-RESIDE in every bin of their intersection,
    // so a wrong tie-break duplicates every pair whose overlap spans a
    // boundary — the random mix below always contains such pairs
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 12) {
      val binW = Seq(7L, 10L, 64L, 1000L)(trial % 4)
      def mk(n: Int, base: Long) = (1 to n).map { i =>
        val lo = rnd.nextInt(2000).toLong
        val len = rnd.nextInt(3 * binW.toInt) - binW / 2 // some empty
        (base + i, lo, lo + len)
      }
      val a = mk(40, 0L)
      val b = mk(60, 1000L)
      val got = RangeJoin
        .intervalOverlap(
          a.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
          b.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", binW)
        .select(col("a_id"), col("b_id"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(got == naiveOverlap(a, b), s"trial $trial (binW=$binW) diverged")
    }
  }

  test("overlap spanning many shared bins emits exactly once; touching excluded") {
    import spark.implicits._
    // [0, 500) vs [50, 450): share bins 0..4 at binW=100 — one emission.
    // [0, 100) vs [100, 200): touching endpoints (half-open) — no pair.
    val a = Seq((1L, 0L, 500L), (2L, 0L, 100L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((1L, 50L, 450L), (2L, 100L, 200L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin
      .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 100L)
      .select(col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }
}

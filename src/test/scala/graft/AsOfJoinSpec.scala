package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.plans.AsOfJoinOps

/** Native as-of join operator (graft.plans.AsOfJoin) edge semantics:
  * backward match, exact-tie inclusion, unmatched-left nulls, key
  * interleaving across the shuffle.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asof(l: Seq[(Long, Long, String)], r: Seq[(Long, Long, String)]) = {
    val lt = l.toDF("k", "t", "lv").repartition(4)
    val rt = r.toDF("rk", "rt", "rv").repartition(3)
    AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt")
      .select(col("k"), col("t"), col("lv"), col("rv"))
      .orderBy(col("k"), col("t"))
      .collect().toSeq
  }

  test("backward match takes the greatest right time <= left time") {
    val out = asof(
      l = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c")),
      r = Seq((1L, 50L, "r50"), (1L, 150L, "r150"), (1L, 250L, "r250")))
    assert(out == Seq(
      Row(1L, 100L, "a", "r50"),
      Row(1L, 200L, "b", "r150"),
      Row(1L, 300L, "c", "r250")))
  }

  test("exact tie (left.t == right.t) matches; earlier left rows don't see later rights") {
    val out = asof(
      l = Seq((7L, 100L, "x"), (7L, 99L, "y")),
      r = Seq((7L, 100L, "r100")))
    assert(out == Seq(
      Row(7L, 99L, "y", null),
      Row(7L, 100L, "x", "r100")))
  }

  test("unmatched keys and too-early lefts get nulls; matches don't leak across keys") {
    val out = asof(
      l = Seq((1L, 100L, "a"), (2L, 100L, "b"), (3L, 100L, "c")),
      r = Seq((1L, 90L, "r1"), (3L, 200L, "r3late")))
    assert(out == Seq(
      Row(1L, 100L, "a", "r1"),
      Row(2L, 100L, "b", null),   // key 2 has no right rows at all
      Row(3L, 100L, "c", null)))  // key 3's right row is in the future
  }

  test("many interleaved keys across partitions stay consistent") {
    val l = for (k <- 1L to 40L; t <- Seq(10L, 20L, 30L)) yield (k, t, s"l$k-$t")
    val r = for (k <- 1L to 40L if k % 2 == 0) yield (k, 15L, s"r$k")
    val out = asof(l, r)
    for (row <- out) {
      val (k, t, rv) = (row.getLong(0), row.getLong(1), row.getString(3))
      if (k % 2 == 0 && t >= 15L) assert(rv == s"r$k", s"row $row")
      else assert(rv == null, s"row $row")
    }
  }

  test("string keys work through the generic key ordering") {
    val lt = Seq(("u1", 100L, 1L), ("u2", 100L, 2L)).toDF("k", "t", "id")
    val rt = Seq(("u1", 90L, 10L), ("u2", 110L, 20L)).toDF("rk", "rt", "rid")
    val out = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt")
      .select(col("k"), col("rid")).orderBy(col("k")).collect()
    assert(out(0) == Row("u1", 10L))
    assert(out(1) == Row("u2", null))
  }

  test("tolerance: matches older than the max gap become null") {
    val lt = Seq((1L, 1000L, "a"), (1L, 5000L, "b")).toDF("k", "t", "lv")
    val rt = Seq((1L, 900L, "r900")).toDF("rk", "rt", "rv")
    val out = AsOfJoinOps
      .asofJoin(spark, lt, rt, "k", "rk", "t", "rt", toleranceNs = Some(500L))
      .select(col("t"), col("rv")).orderBy(col("t")).collect()
    assert(out(0) == Row(1000L, "r900")) // gap 100 <= 500
    assert(out(1) == Row(5000L, null))   // gap 4100 > 500
  }

  test("forward direction takes the smallest right time >= left time") {
    val lt = Seq((1L, 100L, "a"), (1L, 151L, "b"), (2L, 100L, "c"))
      .toDF("k", "t", "lv").repartition(3)
    val rt = Seq((1L, 150L, "r150"), (1L, 250L, "r250")).toDF("rk", "rt", "rv")
    val out = AsOfJoinOps
      .asofJoin(spark, lt, rt, "k", "rk", "t", "rt", forward = true)
      .select(col("k"), col("t"), col("rv")).orderBy(col("k"), col("t")).collect()
    assert(out(0) == Row(1L, 100L, "r150")) // next right at/after 100
    assert(out(1) == Row(1L, 151L, "r250")) // 150 already passed
    assert(out(2) == Row(2L, 100L, null))   // no rights for key 2
  }

  test("broadcast variant: same answers, no shuffle of the left side") {
    val l = for (k <- 1L to 20L; t <- Seq(10L, 20L, 30L)) yield (k, t, s"l$k-$t")
    val r = for (k <- 1L to 20L if k % 2 == 0) yield (k, 15L, s"r$k")
    val lt = l.toDF("k", "t", "lv").repartition(5)
    val rt = r.toDF("rk", "rt", "rv")
    val shuffled = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt")
      .select(col("k"), col("t"), col("rv"))
    val bcast = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt",
      broadcastRight = true)
      .select(col("k"), col("t"), col("rv"))
    assert(bcast.collect().toSet == shuffled.collect().toSet)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinBroadcast"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"left side shuffled in broadcast variant:\n$plan")
    // forward + broadcast agree with forward + shuffle too
    val fs = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt",
      forward = true).select(col("k"), col("t"), col("rv"))
    val fb = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt",
      forward = true, broadcastRight = true).select(col("k"), col("t"), col("rv"))
    assert(fb.collect().toSet == fs.collect().toSet)
  }

  test("plan: one shuffle per side, no window or union fallback") {
    val lt = Seq((1L, 100L, "a")).toDF("k", "t", "lv")
    val rt = Seq((1L, 50L, "r")).toDF("rk", "rt", "rv")
    val df = AsOfJoinOps.asofJoin(spark, lt, rt, "k", "rk", "t", "rt")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), s"custom exec missing:\n$physical")
    assert(!physical.contains("Window"), "fallback window leaked into the plan")
  }
}

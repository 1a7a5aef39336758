package graft

import org.apache.spark.sql.functions._
import graft.operators.StableIds

/** StableIds' contract: the assignment equals the total-sort rank no
  * matter where the sampled range boundaries land — so the SAME data must
  * get the SAME ids under any partition count. */
class StableIdsSpec extends SparkSpec {

  test("ids are identical across partition counts (boundary independence)") {
    import spark.implicits._
    val df = (1 to 5000)
      .map(i => (i.toLong, (i * 2654435761L) % 1000)) // non-unique sort value
      .toDF("k", "v")
    def ids(parts: Int) = StableIds
      .assign(df, Seq(col("v"), col("k")), parts) // k breaks ties: total order
      .select(col("k"), col("stable_id"))
      .as[(Long, Long)].collect().toMap
    val a = ids(3)
    val b = ids(16)
    assert(a == b, "partition count changed the assignment")
    // and the ids are exactly 1..N in sort order
    assert(a.values.toSeq.sorted == (1L to 5000L))
  }

  test("runningTotal equals the single-node global-window prefix sum, any partitioning") {
    import spark.implicits._
    val df = (1 to 3000)
      .map(i => (i.toLong, (i * 2654435761L) % 97)) // value 0..96, dup sort keys
      .toDF("k", "v")
    // reference: exclusive prefix sum over the total order (k)
    val expected = {
      var acc = 0L
      (1 to 3000).map { i =>
        val before = acc; acc += (i * 2654435761L) % 97; (i.toLong, before)
      }.toMap
    }
    for (parts <- Seq(2, 16)) {
      val got = StableIds
        .runningTotal(df, Seq(col("k")), col("v"), parts, outCol = "before")
        .select(col("k"), col("before"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"runningTotal diverged at $parts partitions")
    }
  }

  test("runningMax equals the single-node global-window running max, any partitioning") {
    import spark.implicits._
    // out-of-order values with long flat stretches (max not strictly
    // increasing) — the shape that exposes a wrong prefix combine
    val vals = (1 to 3000).map(i => ((i * 48271L) % 500) - 250)
    val df = vals.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toDF("k", "v")
    val expected = {
      var acc = Long.MinValue
      vals.zipWithIndex.map { case (v, i) =>
        acc = math.max(acc, v); ((i + 1).toLong, acc)
      }.toMap
    }
    for (parts <- Seq(2, 16)) {
      val got = StableIds
        .runningMax(df, Seq(col("k")), col("v"), parts, outCol = "rm")
        .select(col("k"), col("rm"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"runningMax diverged at $parts partitions")
    }
  }
}

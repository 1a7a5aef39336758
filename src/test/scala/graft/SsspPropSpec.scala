package graft

import org.apache.spark.sql.functions._
import graft.operators.Sssp

/** Property contract for bounded-hop weighted shortest paths (q9q): on
  * random weighted digraphs the relaxation loop must produce EXACTLY
  * min-cost-over-≤k-edge-paths per (source, node) — the driver-side
  * reference runs the same recurrence over a dense map. Random weights
  * make hop-count and cost DISAGREE (the cheapest path is often not the
  * shortest in hops), which is exactly what separates this from BFS and
  * catches a frontier-style implementation that settles nodes on first
  * arrival.
  */
class SsspPropSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long, Long)], src: Long,
      hops: Int): Map[Long, Long] = {
    var dist = Map(src -> 0L)
    for (_ <- 1 to hops) {
      var next = dist
      for ((u, v, w) <- edges; du <- dist.get(u)) {
        if (!next.get(v).exists(_ <= du + w)) next += v -> (du + w)
      }
      dist = next
    }
    dist
  }

  test("property: 8 random weighted digraphs x hop bounds match reference") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      val n = 15 + rnd.nextInt(30)
      val m = n + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          1L + rnd.nextInt(9))).distinct
        .filter { case (a, b, _) => a != b }
        // one weight per (src, dst): the operator contract (hash-derived
        // weights are a function of the edge)
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(7)
      val got = Sssp.distances(
        sources.toDF("l"), edges.toDF("src", "dst", "w"), hops)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val want = sources.flatMap(s =>
        reference(edges, s, hops).map { case (v, d) => (s, v) -> d }).toMap
      assert(got === want,
        s"trial $trial: n=$n m=${edges.size} hops=$hops sources=$sources")
    }
  }

  test("hop bound is semantic: k rounds = min cost over <= k edges") {
    // path 0 →(9) 1, and 0 →(1) 2 →(1) 1: one hop sees cost 9, two
    // hops sees the cheaper 2-edge path
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (2L, 1L, 1L))
    def d(hops: Int): Map[Long, Long] =
      Sssp.distances(Seq(0L).toDF("l"), edges.toDF("src", "dst", "w"), hops)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(d(1) === Map(0L -> 0L, 1L -> 9L, 2L -> 1L))
    assert(d(2) === Map(0L -> 0L, 1L -> 2L, 2L -> 1L))
  }
}

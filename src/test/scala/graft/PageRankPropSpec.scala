package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Property contract for distributed PageRank: on random graphs (with
  * dangling nodes and isolated nodes), the result must equal a driver-side
  * reference implementation that replays the operator's exact quantization
  * algebra (12-decimal contribution terms summed exactly, 9-decimal rank
  * rounding, uniform dangling redistribution) — and the total mass must
  * stay 1 within rounding slack every round.
  */
class PageRankPropSpec extends SparkSpec {

  /** the operator's round(x, n): decimal HALF_UP on the double's shortest
    * representation — same as Spark's `round` on DoubleType. */
  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def reference(n: Int, edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => (s, es.size) }
    val inEdges = edges.groupBy(_._2)
    var r = (0L until n.toLong).map(i => i -> rnd(1.0 / n, 9)).toMap
    val teleport = 1.0 - d
    for (_ <- 1 to iters) {
      val dang = r.foldLeft(BigDecimal(0)) { case (acc, (id, rv)) =>
        if (outdeg.contains(id)) acc else acc + BigDecimal(rv).setScale(12)
      }.toDouble
      r = r.map { case (id, _) =>
        val contrib = inEdges.get(id).fold(0.0) { es =>
          es.map { case (s, _) =>
            BigDecimal(rnd(r(s) / outdeg(s), 12)).setScale(14)
          }.sum.toDouble
        }
        id -> rnd(teleport / n + d * (contrib + dang / n), 9)
      }
    }
    r
  }

  test("property: 6 random graphs match the driver-side reference exactly") {
    import spark.implicits._
    val rand = new scala.util.Random(20260815L)
    for (trial <- 1 to 6) {
      val n = 30 + rand.nextInt(40)
      // random sparse graph; ~20% of nodes get no out-edges (dangling)
      val edges = (0 until n).flatMap { s =>
        if (s % 5 == 1) Seq.empty
        else (1 to 1 + rand.nextInt(3)).map(_ => (s.toLong, rand.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
      }.distinct
      val nodes = (0L until n.toLong).toDF("id")
      val got = PageRank
        .run(nodes, edges.toDF("src", "dst"), iters = 3)
        .as[(Long, Double)].collect().toMap
      val want = reference(n, edges, iters = 3, d = 0.85)
      assert(got == want, s"trial $trial (n=$n, |E|=${edges.size}) diverged")
      // mass conservation within per-node rounding slack
      val mass = got.values.sum
      assert(math.abs(mass - 1.0) < n * 1e-9 + 1e-6,
        s"trial $trial: total mass $mass drifted from 1")
    }
  }
}

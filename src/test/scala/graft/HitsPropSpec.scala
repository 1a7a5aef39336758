package graft

import org.apache.spark.sql.functions._
import graft.operators.Hits

/** Property contract for distributed HITS (q99): on random digraphs
  * (with sinks, sources, and isolated nodes) the operator must equal a
  * driver-side reference that replays its exact algebra — per half-step
  * an exact decimal sum of the incoming scores, L1 normalization, and
  * 9-decimal quantization — and every half-step's scores must sum to 1
  * within rounding slack (the L1 invariant).
  */
class HitsPropSpec extends SparkSpec {

  private def rnd(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** one half-step: scores flow joinSide → groupSide along edges */
  private def halfStep(n: Int, edges: Seq[(Long, Long)],
      scores: Map[Long, Double], fromDst: Boolean): Map[Long, Double] = {
    val raw = edges.groupBy(e => if (fromDst) e._1 else e._2)
      .map { case (id, es) =>
        id -> es.map { e =>
          BigDecimal(scores(if (fromDst) e._2 else e._1)).setScale(12)
        }.sum.toDouble
      }
    val total = raw.values
      .foldLeft(BigDecimal(0))((a, v) => a + BigDecimal(v).setScale(12))
      .toDouble
    (0L until n.toLong).map(id =>
      id -> rnd(raw.getOrElse(id, 0.0) / total, 9)).toMap
  }

  private def reference(n: Int, edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Double, Double)] = {
    var hub = (0L until n.toLong).map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to iters) {
      auth = halfStep(n, edges, hub, fromDst = false)
      hub = halfStep(n, edges, auth, fromDst = true)
    }
    (0L until n.toLong).map(id => id -> ((auth(id), hub(id)))).toMap
  }

  test("property: 6 random digraphs match the driver-side reference exactly") {
    import spark.implicits._
    val rand = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val n = 25 + rand.nextInt(40)
      // sparse digraph; every 5th node emits nothing (pure sink/isolated)
      val edges = (0 until n).flatMap { s =>
        if (s % 5 == 2) Seq.empty
        else (1 to 1 + rand.nextInt(3))
          .map(_ => (s.toLong, rand.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
      }.distinct
      val nodes = (0L until n.toLong).toDF("id")
      val got = Hits.run(nodes, edges.toDF("src", "dst"), iters = 2)
        .as[(Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = reference(n, edges, iters = 2)
      assert(got == want, s"trial $trial (n=$n, |E|=${edges.size}) diverged")
      // L1 invariant: each score vector sums to 1 within rounding slack
      val aMass = got.values.map(_._1).sum
      val hMass = got.values.map(_._2).sum
      assert(math.abs(aMass - 1.0) < n * 1e-9 + 1e-6, s"auth mass $aMass")
      assert(math.abs(hMass - 1.0) < n * 1e-9 + 1e-6, s"hub mass $hMass")
    }
  }
}

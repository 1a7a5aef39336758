package graft

import org.apache.spark.sql.functions._
import graft.operators.LabelPropagation

/** Synchronous label propagation must equal a driver-side reference on
  * random graphs — the argmax tie-break (max count, then smallest label)
  * and the isolated-node keep-own rule are the contract; everything is
  * integer, so equality is exact. */
class LabelPropagationSpec extends SparkSpec {

  private def reference(n: Int, edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val und = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .filter(e => e._1 != e._2)
    val adj = und.groupBy(_._1).map { case (s, es) => (s, es.map(_._2)) }
    var lab = (0L until n.toLong).map(i => i -> i).toMap
    for (_ <- 1 to iters) {
      val prev = lab
      lab = lab.map { case (id, own) =>
        id -> adj.get(id).fold(own) { ns =>
          val counts = ns.groupBy(prev).map { case (l, xs) => (l, xs.size) }
          counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
    }
    lab
  }

  test("property: 6 random graphs match the driver-side reference exactly") {
    import spark.implicits._
    val rand = new scala.util.Random(20260816L)
    for (trial <- 1 to 6) {
      val n = 25 + rand.nextInt(40)
      val edges = (0 until n).flatMap { s =>
        (1 to rand.nextInt(4)).map(_ => (s.toLong, rand.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
      }.distinct
      val nodes = (0L until n.toLong).toDF("id")
      for (iters <- Seq(1, 2)) {
        val got = LabelPropagation
          .run(nodes, edges.toDF("src", "dst"), iters)
          .as[(Long, Long)].collect().toMap
        val want = reference(n, edges, iters)
        assert(got == want,
          s"trial $trial iters=$iters (n=$n, |E|=${edges.size}) diverged")
      }
    }
  }

  test("isolated nodes keep their own label; a triangle converges to its min id") {
    import spark.implicits._
    val nodes = (0L to 4L).toDF("id")
    // triangle 0-1-2; node 3 isolated; node 4 isolated
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = LabelPropagation.run(nodes, edges, 2)
      .as[(Long, Long)].collect().toMap
    // each triangle node sees two neighbors with distinct labels round 1
    // (tie) -> adopts the smaller; by round 2 all three carry 0
    assert(got(3L) == 3L && got(4L) == 4L)
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L)
  }
}

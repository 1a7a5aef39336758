package graft

import org.apache.spark.sql.functions._

import graft.operators.LubyMis

/** MIS invariants on random graphs, checked driver-side: independence
  * (no edge joins two 'in' nodes), witnessed drops (every 'out' node
  * has an 'in' neighbor — the property that makes an MIS-based dedup
  * drop defensible), and decision-coverage (an 'undecided' node must
  * still have undecided neighbors — the rounds cap is the only reason
  * anything stays open). */
class LubyMisPropSpec extends SparkSpec {
  import spark.implicits._

  test("independence, witnessed drops, and undecided-only-at-frontier on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 30
      val edges = (1 to n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val nodes = (0L until n.toLong).toDF("doc_id")
      val res = LubyMis.run(nodes, edges.toDF("id_a", "id_b"))
        .select("doc_id", "status").as[(Long, String)].collect().toMap
      assert(res.size == n)
      val adj = edges.flatMap(p => Seq(p, p.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      edges.foreach { case (a, b) =>
        assert(!(res(a) == "in" && res(b) == "in"),
          s"trial $trial: edge ($a,$b) joins two 'in' nodes")
      }
      res.foreach { case (v, st) =>
        if (st == "out")
          assert(adj(v).exists(res(_) == "in"),
            s"trial $trial: 'out' node $v has no 'in' witness")
        if (st == "undecided")
          assert(adj.getOrElse(v, Set.empty).exists(res(_) == "undecided"),
            s"trial $trial: 'undecided' node $v has no undecided neighbor")
      }
      // isolated nodes always win round 1
      (0L until n.toLong).filter(v => !adj.contains(v))
        .foreach(v => assert(res(v) == "in"))
    }
  }
}

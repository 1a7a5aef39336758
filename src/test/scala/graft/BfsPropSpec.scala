package graft

import org.apache.spark.sql.functions._
import graft.operators.Bfs

/** Property contract for multi-source BFS (q97): on random digraphs the
  * level-synchronous frontier must produce EXACTLY the distances a
  * driver-side reference BFS computes from each source — every reachable
  * node within the horizon present once with the true shortest distance,
  * nothing beyond the horizon, nothing unreachable. Random graphs at
  * several densities cover the failure shapes: a frontier that re-visits
  * settled nodes (distance too small is impossible, duplicates are not),
  * one that merges levels (distance off by one), and horizon off-by-ones.
  */
class BfsPropSpec extends SparkSpec {
  import spark.implicits._

  private def referenceBfs(n: Int, edges: Seq[(Long, Long)], src: Long,
      maxDepth: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = Map(src -> 0L)
    var frontier = Seq(src)
    var d = 0L
    while (frontier.nonEmpty && d < maxDepth) {
      d += 1
      val next = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
        .distinct.filterNot(dist.contains)
      next.foreach(v => dist += v -> d)
      frontier = next
    }
    dist
  }

  test("property: 8 random digraphs x depths match reference BFS") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(40)
      val m = n + rnd.nextInt(3 * n) // sparse through dense-ish
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
        .filter { case (a, b) => a != b }
      val sources = Seq.fill(3)(rnd.nextInt(n).toLong).distinct
      val maxDepth = 1 + rnd.nextInt(6)
      val got = Bfs.distances(
        sources.toDF("l"), edges.toDF("src", "dst"), maxDepth)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = sources.flatMap(s =>
        referenceBfs(n, edges, s, maxDepth).map { case (v, d) =>
          (s, v) -> d
        }).toMap
      assert(got === want, s"trial $trial: n=$n m=${edges.size} " +
        s"sources=$sources depth=$maxDepth")
    }
  }
}

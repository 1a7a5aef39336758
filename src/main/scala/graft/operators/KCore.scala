package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative k-core peeling (Seidman 1983; the distributed formulation of
  * Montresor et al. 2013): repeatedly delete nodes with degree < k — what
  * remains after convergence is the k-core, the standard graph-quality
  * signal (spam/link-farm detection keeps high-core nodes; isolated
  * link-ring tendrils peel away).
  *
  * Each round is one map-side-combining degree aggregation plus two
  * left-semi joins of the edge list against the surviving-node set — all
  * narrow integer-key shuffles, no node ever sees more than its own
  * degree. Round count is a PARAMETER (not run-to-fixpoint): the oracle
  * unrolls the same fixed number of rounds, and a caller at 100 TB picks
  * the budget the same way PageRank picks an iteration count. Lineage is
  * cut per round ([[IterationCheckpoint]] — durable on a cluster via
  * `spark.graft.iteration.checkpointDir`) so the loop cannot stack plan depth.
  */
object KCore {

  private def canon(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** `rounds` peeling rounds at threshold `k` over an undirected edge
    * list (any orientation/duplication); returns (node, deg) — each
    * survivor with its degree in the surviving subgraph. */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = IterationCheckpoint.cut(canon(edges))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("node"))
      e = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .transform(IterationCheckpoint.cut)
    }
    degrees(e)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation — community detection over an undirected
  * graph (Raghavan et al., "Near linear time algorithm to detect community
  * structures in large-scale networks", 2007): every node starts labeled
  * with its own id, and each round adopts the label most frequent among
  * its neighbors (ties → smallest label; isolated nodes keep their own).
  * The SYNCHRONOUS variant (all nodes update from the previous round's
  * labels) is deliberate: async update order is scheduler-dependent, which
  * would make the result nondeterministic across engines and runs —
  * synchronous rounds are a pure function of (graph, round count), so an
  * oracle can unroll them exactly.
  *
  * Same Pregel-on-DataFrames discipline as [[PageRank]]: per round, ONE
  * shuffle of (node, neighborLabel) pairs, a count agg, and a
  * deterministic argmax (`max_by` over (count, -label)); label tables are
  * narrow (id, label) rows — at 100 TB the shuffles never carry bodies.
  * All arithmetic is integer, so cross-engine replay needs no decimal
  * quantization at all. Lineage cut per round via [[IterationCheckpoint]]
  * (durable on a cluster via `spark.graft.iteration.checkpointDir`).
  *
  * `edges` is a directed (src, dst) table; it is symmetrized and
  * deduplicated internally (community structure is an undirected notion).
  */
object LabelPropagation {

  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")) // a node is not its own neighbor
      .distinct()
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lab"))
    for (_ <- 1 to iters) {
      val neigh = und.join(labels, und("dst") === labels("id"))
        .groupBy(und("src").as("nid"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val best = neigh.groupBy(col("nid"))
        .agg(max_by(col("lab"), struct(col("cnt"), (-col("lab")).as("nl")))
          .as("newlab"))
      labels = labels
        .join(best, labels("id") === best("nid"), "left")
        .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab"))
        .transform(IterationCheckpoint.cut)
    }
    labels
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * (SURVEY.md §2.12: dedup-cluster formation without a graph library).
  *
  * Each node starts labeled with itself; every round, each node takes the
  * minimum label among itself and its neighbors; convergence when no label
  * changes. Rounds needed = graph diameter (near-dup clusters are tiny, so
  * 2-4 in practice); each round is one shuffle join on node id — the
  * standard "hash-to-min" pattern that scales to billions of edges because
  * state per round is exactly one (node, label) row per node.
  *
  * `localCheckpoint` per round cuts the growing lineage so round N's plan
  * doesn't replay rounds 1..N-1 (and bounds driver plan-size growth — the
  * classic iterative-DataFrame failure mode at scale; on a cluster use
  * `checkpoint` with a durable dir for fault tolerance instead).
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `id_a`, `id_b`
    * @return (node, component) where component = min node id reachable */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = sym.join(labels, sym("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // the `changed` flag rides inside the SAME materializing job as the
      // round's join+agg (the eager localCheckpoint); the convergence
      // probe below then only reads cached blocks — isEmpty stops at the
      // first cached partition with a changed row, so each round costs
      // one real job plus a cache probe, not a recompute.
      val next = labels.join(nbrMin, labels("node") === nbrMin("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label") < col("label")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("node"), col("label"))
      round += 1
    }
    // a silent non-converged result would be WRONG components (clusters
    // split at the round horizon) — fail loudly instead; rounds needed =
    // graph diameter, so a legitimate deep graph just needs a higher cap
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxRounds rounds " +
        "(graph diameter exceeds the cap); raise maxRounds — a truncated " +
        "result would silently split components")
    labels.select(col("node"), col("label").as("component"))
  }
}

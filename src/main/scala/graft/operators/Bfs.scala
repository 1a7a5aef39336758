package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS (unweighted shortest-path distances) on a directed
  * graph — the landmark-distance primitive of link-graph analytics
  * (SURVEY.md §2.12 Tier C): crawl-depth from seed hosts, spam distance
  * from a trusted core, reachability tiers for frontier scheduling.
  * TrustRank (q6u) answers "how much authority flows from the seeds";
  * this answers "how many hops away is everything", which no
  * random-walk operator expresses.
  *
  * Level-synchronous frontier expansion, all sources at once: round d
  * joins the depth-(d−1) frontier with the edge list, dedupes, and
  * anti-joins the settled set — the BFS invariant (first arrival =
  * shortest distance) makes the min() fold implicit, so no per-round
  * min-aggregate over the full distance table is needed, only over the
  * NEW rows. Rounds = graph diameter (inherent to unweighted BFS;
  * there is no pointer-jumping shortcut for distances the way there is
  * for min-label reachability, because distance composes additively,
  * not idempotently).
  *
  * Scale shape: every row is (source, node, dist) — three longs; the
  * frontier join shuffles on node id; the settled set is only touched
  * by the anti-join (broadcast-able while the frontier is small, AQE's
  * call). Lineage is cut per round via [[IterationCheckpoint]].
  */
object Bfs {

  /** @param sources one `l` (long) row per BFS source (landmark)
    * @param edges directed `src` → `dst` rows
    * @param maxDepth hard round bound; nodes farther than this from a
    *                 source are ABSENT from that source's rows (the
    *                 caller's oracle must apply the same horizon)
    * @return (l, node, dist) — dist = length of the shortest directed
    *         path from l to node, 0 for the source itself */
  def distances(sources: DataFrame, edges: DataFrame,
      maxDepth: Int): DataFrame = {
    // fresh attribute ids for the edge columns: callers routinely derive
    // `sources` FROM `edges` (landmarks = top in-degree), which would
    // make the frontier⋈edges join self-ambiguous otherwise
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
    var dist = sources
      .select(col("l"), col("l").as("node"), lit(0L).as("dist"))
      .distinct()
    var frontier = dist
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = frontier.join(e, frontier("node") === e("e_src"))
        .select(col("l"), col("e_dst").as("node"),
          lit(depth.toLong).as("dist"))
        .distinct()
        .join(dist.select(col("l"), col("node")), Seq("l", "node"),
          "left_anti")
      frontier = IterationCheckpoint.cut(next)
      // dist stays a lazy union OF the cut frontiers: every leg is
      // already materialized, so there is nothing to recompute and no
      // point re-materializing the whole table each round; plan depth
      // grows only by one union per level (≤ maxDepth)
      dist = dist.unionByName(frontier)
    }
    dist
  }
}

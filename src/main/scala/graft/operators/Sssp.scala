package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source weighted shortest paths (bounded-hop Bellman–Ford) on a
  * directed graph with per-edge costs — the weighted complement of
  * [[Bfs]] (SURVEY.md §2.12 Tier C): hop counts answer "how far", edge
  * costs answer "how expensive" (latency-weighted link distance,
  * crawl-cost budgeting, trust attenuation with per-link penalties).
  *
  * Distance composes ADDITIVELY, so the pointer-jumping shortcut that
  * makes min-label reachability O(log d) ([[Scc]]) does not apply;
  * Bellman–Ford's relaxation IS the distributed recurrence:
  * d_k(v) = min(d_{k-1}(v), min over u→v of d_{k-1}(u) + w(u,v)) —
  * after k rounds, d_k is EXACTLY the min cost over paths of ≤ k edges.
  * The hop bound is therefore a semantic parameter (the caller's oracle
  * must replay the same k), not just a safety valve; with non-negative
  * weights d_k converges to the true shortest path once k reaches the
  * longest shortest-path hop count, and the loop exits early when a
  * round changes nothing.
  *
  * Scale shape: per round ONE narrow (l, node, d) shuffle — three longs
  * — through a map-side-combining min agg; the settled table never
  * carries payloads; lineage cut per round via [[IterationCheckpoint]].
  * No negative-cycle hazard by construction when weights are ≥ 0; with
  * negative weights the bounded-hop semantics stay well-defined (min
  * over ≤ k-edge WALKS), which is why the bound is part of the contract.
  */
object Sssp {

  /** @param sources one `l` (long) row per source
    * @param edges directed (src, dst, w) rows, w integral
    * @param maxHops relaxation rounds = max path length considered
    * @return (l, node, d) — min cost over paths of ≤ maxHops edges from
    *         l to node; absent if unreachable within the bound */
  def distances(sources: DataFrame, edges: DataFrame,
      maxHops: Int): DataFrame = {
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"),
      col("w").as("e_w"))
    var dist = IterationCheckpoint.cut(
      sources.select(col("l"), col("l").as("node"), lit(0L).as("d"))
        .distinct())
    var round = 0
    var changed = true
    while (round < maxHops && changed) {
      round += 1
      val relax = dist.join(e, dist("node") === e("e_src"))
        .select(col("l"), col("e_dst").as("node"),
          (col("d") + col("e_w")).as("d"))
      val next = IterationCheckpoint.cut(
        dist.unionByName(relax)
          .groupBy(col("l"), col("node")).agg(min(col("d")).as("d")))
      // fixpoint probe: a row is new-or-improved iff its (l, node, d)
      // triple is absent from the previous table (d only ever decreases)
      changed = !next.join(dist, Seq("l", "node", "d"), "left_anti").isEmpty
      dist = next
    }
    dist
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components in O(log N) rounds
  * (SURVEY.md §2.12: dedup-cluster formation without a graph library).
  *
  * Shiloach–Vishkin-style alternation, one round = two steps:
  *
  *   1. HOOK:     l(u) := min(l(u), min over neighbors v of l(v))
  *   2. SHORTCUT: l(u) := l(l(u))   (pointer jumping)
  *
  * Labels are always ids of nodes in the same component (init: self; hook
  * takes a neighbor's label; shortcut takes a component member's label), and
  * only ever decrease. Hooking alone converges in O(diameter) rounds — the
  * classic failure mode on chain topologies (templated boilerplate corpora:
  * doc A ~ B ~ C ~ …), where diameter ≈ chain length and 100 TB means
  * thousands of sequential Spark jobs. The shortcut step roughly doubles
  * each label's "distance jumped" per round (d → 2d+1 on a path), so
  * convergence is O(log diameter): a 1M-node chain needs ~21 rounds, not
  * 1M. Fixpoint of both steps ⇒ labels constant per component (a boundary
  * node adjacent to a smaller label would hook) and that constant is the
  * component min (the min node's label starts at itself and never rises).
  *
  * Cost per round: one shuffle join+agg on the edge list (hook) and one
  * label-sized self-join (shortcut) — state per round is still exactly one
  * (node, label) row per node, so the pattern scales to billions of edges.
  * Near convergence the shortcut join key (label) concentrates on component
  * minima; the map side is labels themselves (bounded by node count) and
  * AQE's runtime skew-join splitting handles a giant component's hot key —
  * the same reliance every hash-to-min variant has.
  *
  * [[IterationCheckpoint]] per round cuts the growing lineage so round N's
  * plan doesn't replay rounds 1..N-1 (and bounds driver plan-size growth —
  * the classic iterative-DataFrame failure mode at scale; set
  * `spark.graft.iteration.checkpointDir` on a cluster for durable,
  * executor-loss-tolerant checkpoints instead of executor-local blocks).
  */
object ConnectedComponents {

  /** @param edges undirected edge list with long columns `id_a`, `id_b`
    * @return (node, component) where component = min node id reachable */
  def run(edges: DataFrame, maxRounds: Int = 50): DataFrame =
    runCounted(edges, maxRounds)._1

  /** As [[run]], also returning the number of rounds executed — exposed so
    * specs and ScaleProbe can assert the O(log N) bound (a 2^50-diameter
    * graph would be needed to hit the default cap). */
  def runCounted(edges: DataFrame, maxRounds: Int = 50): (DataFrame, Int) = {
    // NOT wrapped in AqeConf.coalesceBySize: an A/B at sf0.1/cpus=32
    // measured the size-targeted coalescing SLOWER for single-chain CC
    // consumers (q6a 3.4→4.4 s, q8f 6.1→8.3 s, q6k 4.4→5.1 s) — a lone
    // round chain wants its partitions spread over idle cores. It wins
    // only when several chains run concurrently and share the cores
    // (qb2's threshold sweep scopes it at ITS call site).
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .transform(IterationCheckpoint.cut)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(IterationCheckpoint.cut)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // HOOK, fused to ONE join + ONE aggregate (round 16): the node's
      // own label rides the same shuffle as its neighbors' labels as a
      // tagged self-message, so min(l(u), min_nbr l(v)) falls out of one
      // groupBy — the old labels⋈nbrMin re-join (a second label-table
      // exchange and a whole join stage per round) is gone. The self
      // branch also keeps the aggregate total over nodes (every node
      // emits its self row even with no neighbors), and min(old) over
      // the single self row recovers the pre-hook label for the change
      // flag. Identical per-round algebra to the unfused form — the
      // prop spec's round-count and fixpoint claims are unchanged.
      val hooked = sym.join(labels, sym("dst") === labels("node"))
        .select(col("src").as("node"), col("label"), lit(null).cast("long").as("own"))
        .unionByName(labels.select(col("node"), col("label"), col("label").as("own")))
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), min(col("own")).as("old"))
        .select(col("node"), col("label"),
          (col("label") < col("old")).as("hook_changed"))
      // SHORTCUT: l(u) := l(l(u)). Every label IS a node id (invariant
      // above), so the inner join is total. The `changed` flag rides
      // inside the SAME materializing job as the round's joins (the eager
      // localCheckpoint); the convergence probe below then only reads
      // cached blocks — isEmpty stops at the first cached partition with
      // a changed row, so each round costs one real job plus a cache
      // probe, not a recompute.
      val lmap = hooked.select(col("node").as("ln"), col("label").as("llabel"))
      val next = hooked.join(lmap, hooked("label") === lmap("ln"))
        .select(hooked("node"),
          col("llabel").as("label"),
          (col("hook_changed") || col("llabel") < hooked("label")).as("changed"))
        .transform(IterationCheckpoint.cut)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select(col("node"), col("label"))
      round += 1
    }
    // a silent non-converged result would be WRONG components (clusters
    // split at the round horizon) — fail loudly instead; with pointer
    // jumping, rounds needed ≈ log2(diameter) + 2, so the default cap
    // covers any physically-storable graph
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxRounds rounds " +
        "(log2(diameter) exceeds the cap); raise maxRounds — a truncated " +
        "result would silently split components")
    (labels.select(col("node"), col("label").as("component")), round)
  }

  /** INCREMENTAL connected components: merge a batch of NEW edges into a
    * standing `(node, component)` label table without re-running CC over
    * the corpus — the streaming twin of [[run]] (a near-dup pair arriving
    * via CDC should cost O(|delta|), not O(|corpus|)).
    *
    * Algebra: a standing component behaves as ONE super-node (its id — by
    * construction the min member id). Each delta edge (a, b) therefore
    * reduces to an edge between comp(a) and comp(b), where comp(x) is x's
    * persisted label, or x itself when x is new. Running [[run]] on that
    * REDUCED graph — O(|delta|) nodes, never the corpus — yields a merge
    * mapping old-component → merged-component, and since every reduced
    * node id is the min of its members, the merged min is the true global
    * min: exactly what full CC over the union graph would assign.
    *
    * Cost shape at 100 TB: the reduced CC and the endpoint-label lookup
    * touch O(|delta|) rows; the only corpus-sized operation is the final
    * relabel, a BROADCAST hash join of the (tiny, ≤ 2·|delta| row) merge
    * mapping against the standing labels — no shuffle of the label table,
    * no edge re-scan. Components untouched by the delta map to themselves
    * (the mapping drops identity rows, so their join misses and coalesce
    * keeps the old label).
    *
    * @param labels standing assignment `(node, component)` — must be a
    *   true CC fixpoint (component = min reachable id), e.g. [[run]]'s
    *   output or a previous [[incremental]] result
    * @param deltaEdges new undirected edges `(id_a, id_b)`; endpoints not
    *   present in `labels` are admitted as new nodes
    * @return merged `(node, component)` covering labels ∪ delta endpoints
    */
  def incremental(labels: DataFrame, deltaEdges: DataFrame): DataFrame = {
    val ends = deltaEdges.select(col("id_a").as("n"))
      .unionByName(deltaEdges.select(col("id_b").as("n")))
      .distinct()
    val endComp = ends
      .join(labels.select(col("node").as("n"), col("component")), Seq("n"), "left")
      .select(col("n"), coalesce(col("component"), col("n")).as("comp"))
      .localCheckpoint() // consumed 3× below; never recompute the lookup
    val compEdges = deltaEdges
      .join(endComp.select(col("n").as("id_a"), col("comp").as("ca")), Seq("id_a"))
      .join(endComp.select(col("n").as("id_b"), col("comp").as("cb")), Seq("id_b"))
      .select(col("ca").as("id_a"), col("cb").as("id_b"))
    val merged = run(compEdges) // reduced graph: O(|delta|) nodes
    val mapping = merged
      .select(col("node").as("component"), col("component").as("merged"))
      .filter(col("component") =!= col("merged")) // identity rows add nothing
    val newRows = endComp
      .join(labels, endComp("n") === labels("node"), "left_anti")
      .select(col("n").as("node"), col("comp").as("component"))
    labels.unionByName(newRows)
      .join(broadcast(mapping), Seq("component"), "left")
      .select(col("node"),
        coalesce(col("merged"), col("component")).as("component"))
  }
}

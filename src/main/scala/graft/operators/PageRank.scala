package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Damped PageRank over a (src, dst) edge table — the link-graph ranking
  * signal of web-corpus curation (domain/page authority for crawl
  * prioritization and quality weighting; Page et al., "The PageRank
  * Citation Ranking", 1998).
  *
  * Shape per iteration (the Pregel-on-DataFrames pattern, same driver-loop
  * discipline as the k-means index build):
  *   - contributions: edges ⋈ ranks on src (shuffle carries (dst, contrib)
  *     pairs only — never document bodies), map-side-combining hash agg by
  *     dst;
  *   - dangling mass (nodes with no out-edges) collected as ONE in-plan
  *     scalar subquery per round and redistributed uniformly — at 100 TB
  *     this is a map-side-partial count-sum, not a driver collect of rows;
  *   - new rank = (1-d)/N + d·(contrib + dang/N), LEFT join back to the
  *     node set so zero-in-degree nodes keep their teleport mass;
  *   - lineage cut per round via [[IterationCheckpoint]] (executor-local
  *     by default; set `spark.graft.iteration.checkpointDir` on a real
  *     cluster for executor-loss fault tolerance).
  *
  * Cross-engine determinism (the k-means idiom): per-edge contributions
  * round to 12 decimals and sum as DECIMAL(30,14) — exact, reduction-order
  * independent — and each round's rank quantizes to `round(·, 9)`, so an
  * oracle unrolling the same algebra reproduces every iteration bit-exactly.
  *
  * `nodes` must have a long `id` column covering every edge endpoint;
  * `edges` must be (src, dst) long columns, already deduplicated if the
  * caller means a simple graph. Returns (id, pr) after `iters` rounds.
  */
object PageRank {

  def run(nodes: DataFrame, edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.select(col("id"))
    val nCount: Column = n.agg(count(lit(1)).as("n")).scalar()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val teleport = lit(1.0) - lit(damping)
    var ranks = n.select(col("id"),
      round(lit(1.0) / nCount, 9).as("pr"))
    for (_ <- 1 to iters) {
      // ONE pass of ranks against outdeg per round (round-16 fusion):
      // the materialized (id, pr, outdeg) frame feeds BOTH the dangling
      // total (rows whose outdeg is null — the exact decimal sum of
      // already-quantized ranks the old anti-join subquery computed,
      // value-identical) and the contribution messages (one join with
      // the edge list instead of the old edges⋈ranks⋈outdeg double
      // join). The cut makes the shared frame cached blocks, so the
      // scalar subquery reads node-sized cache instead of re-running a
      // join per round.
      val shared = IterationCheckpoint.cut(
        ranks.join(outdeg, ranks("id") === outdeg("src"), "left")
          .select(col("id"), col("pr"), col("outdeg")))
      val dang: Column = shared.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr").cast("decimal(30,12)")), lit(0))
          .cast("double").as("d"))
        .scalar()
      val contrib = edges
        .join(shared.filter(col("outdeg").isNotNull),
          edges("src") === col("id"))
        .select(col("dst"),
          round(col("pr") / col("outdeg"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast("decimal(30,14)")).cast("double").as("contrib"))
      ranks = n
        .join(contrib, n("id") === contrib("dst"), "left")
        .select(n("id"),
          round(teleport / nCount
            + lit(damping) * (coalesce(col("contrib"), lit(0.0))
              + dang / nCount), 9).as("pr"))
        .transform(IterationCheckpoint.cut)
    }
    ranks
  }

  /** Personalized PageRank with the teleport (and dangling) mass
    * restricted to a SEED set — TrustRank (Gyöngyi, Garcia-Molina &
    * Pedersen, VLDB 2004): authority flows outward from hand-trusted
    * seeds only, so disconnected link farms score zero no matter how
    * densely they cite each other. The corpus-curation use: propagate
    * quality from a small vetted allowlist over the crawl link graph and
    * weight/filter training documents by the result.
    *
    * Same per-round shape, shuffles and determinism idioms as [[run]];
    * the only changes are the initial vector (uniform over seeds, zero
    * elsewhere) and the teleport term (seeds get
    * (1-d)/|S| + d·dangling/|S|, non-seeds get nothing). `seeds` must be
    * an (id) subset of `nodes`. */
  def runPersonalized(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.select(col("id"))
    val sd = seeds.select(col("id")).withColumn("seed", lit(1))
    val sCount: Column = sd.agg(count(lit(1)).as("ns")).scalar()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = n.join(sd, Seq("id"), "left")
      .select(col("id"),
        when(col("seed").isNotNull, round(lit(1.0) / sCount, 9))
          .otherwise(lit(0.0)).as("pr"))
    for (_ <- 1 to iters) {
      // the run() round-16 fusion, personalized edition: one shared
      // (id, pr, outdeg) pass feeds the dangling total and the
      // contribution messages — value-identical to the old anti-join
      // subquery + double join
      val shared = IterationCheckpoint.cut(
        ranks.join(outdeg, ranks("id") === outdeg("src"), "left")
          .select(col("id"), col("pr"), col("outdeg")))
      val dang: Column = shared.filter(col("outdeg").isNull)
        .agg(coalesce(sum(col("pr").cast("decimal(30,12)")), lit(0))
          .cast("double").as("d"))
        .scalar()
      val contrib = edges
        .join(shared.filter(col("outdeg").isNotNull),
          edges("src") === col("id"))
        .select(col("dst"),
          round(col("pr") / col("outdeg"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast("decimal(30,14)")).cast("double").as("contrib"))
      val seedBonus = (lit(1.0) - lit(damping)) / sCount +
        lit(damping) * (dang / sCount)
      ranks = n.join(sd, Seq("id"), "left")
        .join(contrib, col("id") === contrib("dst"), "left")
        .select(col("id"),
          round(lit(damping) * coalesce(col("contrib"), lit(0.0))
            + when(col("seed").isNotNull, seedBonus).otherwise(lit(0.0)),
            9).as("pr"))
        .transform(IterationCheckpoint.cut)
    }
    ranks
  }
}

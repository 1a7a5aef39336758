package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HITS — hubs and authorities (Kleinberg, "Authoritative Sources in a
  * Hyperlinked Environment", JACM 1999) over a (src, dst) edge table.
  * The link-analysis complement of [[PageRank]]: PageRank scores a page
  * by the authority FLOWING INTO it; HITS separates the two roles a page
  * can play — a good *hub* links to many good authorities, a good
  * *authority* is linked from many good hubs. Corpus-curation use:
  * directory/link-list pages (high hub) are navigation boilerplate to
  * down-weight, high-authority pages are quality anchors — one score
  * can't express both.
  *
  * Per iteration (mutual recursion, two half-steps):
  *   - authority: edges ⋈ hubs on src, map-side-combining sum by dst —
  *     ONE narrow (dst, hub-score) shuffle;
  *   - L1 normalization: the score total rides an in-plan scalar
  *     subquery (map-side partial sum, no driver collect), every score
  *     divides by it — HITS diverges without normalization, and L1 keeps
  *     the algebra in +/÷ (an L2 sqrt adds nothing but replay hazard);
  *   - hub: the mirrored half-step, edges ⋈ fresh authorities on dst,
  *     sum by src, normalize;
  *   - LEFT join back to the node set: sinks keep authority 0, sources
  *     keep hub 0, and every node reports a row;
  *   - lineage cut per half-step via [[IterationCheckpoint]].
  *
  * Cross-engine determinism (the PageRank idiom): summands are already
  * 9-decimal quantized, sums run as DECIMAL(30,12) — exact and
  * reduction-order independent — and each normalized score quantizes to
  * `round(·, 9)`, so an oracle unrolling the same algebra replays every
  * iteration bit-exactly.
  *
  * `nodes` needs a long `id` covering every edge endpoint; `edges` is
  * (src, dst), pre-deduplicated if the caller means a simple graph.
  * Returns (id, auth, hub) after `iters` full iterations.
  */
object Hits {

  def run(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.select(col("id"))

    def halfStep(scores: DataFrame, scoreCol: String, joinSide: String,
        groupSide: String, outCol: String): DataFrame = {
      val raw = edges
        .join(scores, edges(joinSide) === scores("id"))
        .groupBy(edges(groupSide).as("gid"))
        .agg(sum(col(scoreCol).cast("decimal(30,12)")).cast("double")
          .as("raw"))
      val total: Column = raw
        .agg(sum(col("raw").cast("decimal(30,12)")).cast("double").as("s"))
        .scalar()
      IterationCheckpoint.cut(
        n.join(raw, n("id") === raw("gid"), "left")
          .select(n("id"),
            round(coalesce(col("raw"), lit(0.0)) / total, 9).as(outCol)))
    }

    var hub = n.select(col("id"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // authority from hubs: in-links deliver hub mass (join on src,
      // group by dst) — then hubs from the FRESH authorities (mirror)
      auth = halfStep(hub, "hub", "src", "dst", "auth")
      hub = halfStep(auth, "auth", "dst", "src", "hub")
    }
    auth.join(hub, Seq("id"))
  }
}

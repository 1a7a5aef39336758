package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Link-graph operators (SURVEY.md §2.12, Tier C): the graph-authority
  * side of corpus curation. Connected components (clustering) lives with
  * the dedup family in `DedupQueries`/`operators.ConnectedComponents`;
  * this file holds the ranking side.
  *
  * The corpus has no real hyperlink table, so the link graph is
  * synthesized DETERMINISTICALLY from doc ids (three pseudo-links per doc
  * via a multiplicative hash, ~3% of docs made deliberately dangling) —
  * both engines derive the identical edge set, and the operator under
  * test ([[graft.operators.PageRank]]) only ever sees an ordinary
  * (src, dst) DataFrame, exactly what a real crawl-graph extraction
  * would hand it.
  */
object GraphQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The deterministic pseudo-link graph shared by q6n/q6p: 3 hash-derived
    * out-links per doc, self-loops removed, docs with id % 37 = 5 stripped
    * of all out-links (PageRank's dangling-node path). Mirrors the e0/e
    * CTEs in both oracles exactly. */
  private def pseudoEdges(nodes: DataFrame, nCount: org.apache.spark.sql.Column): DataFrame =
    nodes
      .select(col("id").as("src"),
        explode(sequence(lit(0), lit(2))).as("i"))
      .select(col("src"),
        ((col("src") * lit(2654435761L) + col("i") * lit(40503241L))
          % 999983L % nCount).as("dst"))
      .filter(col("dst") =!= col("src") && col("src") % 37 =!= 5)
      .distinct()

  /** Shared oracle SQL for the pseudo-link graph (must stay in lockstep
    * with [[pseudoEdges]]). */
  private val EdgeCtes =
    """nn AS (SELECT COUNT(*) AS n FROM documents),
        e0 AS (SELECT doc_id AS src,
            (doc_id * 2654435761 + i.i * 40503241) % 999983
              % (SELECT n FROM nn) AS dst
          FROM documents, (SELECT unnest([0, 1, 2]) AS i) i),
        e AS (SELECT DISTINCT src, dst FROM e0
          WHERE dst <> src AND src % 37 <> 5)"""

  /** One unrolled PageRank round in DuckDB SQL: dangling mass d<k>,
    * contributions c<k> (12-decimal terms, exact decimal sum), new rank
    * r<k> quantized to 9 decimals — the same algebra PageRank.run
    * executes, so 3 unrolled rounds replay the distributed loop exactly. */
  private def oracleRound(k: Int): String = {
    val prev = s"r${k - 1}"
    s"""d$k AS (SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(30,12))), 0) AS DOUBLE) AS d
         FROM $prev LEFT JOIN deg ON $prev.id = deg.src WHERE deg.src IS NULL),
       c$k AS (SELECT e.dst AS id,
           CAST(SUM(CAST(round($prev.r / deg.outdeg, 12) AS DECIMAL(30,14))) AS DOUBLE) AS c
         FROM e JOIN $prev ON e.src = $prev.id JOIN deg ON e.src = deg.src
         GROUP BY e.dst),
       r$k AS (SELECT $prev.id,
           round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
             + CAST(0.85 AS DOUBLE) * (COALESCE(c$k.c, 0.0)
               + (SELECT d FROM d$k) / (SELECT n FROM nn)), 9) + 0 AS r
         FROM $prev LEFT JOIN c$k ON $prev.id = c$k.id)"""
  }

  val all: Seq[QueryDef] = Seq(

    // PageRank over a deterministic pseudo-link graph: 3 hash-derived
    // out-links per doc (self-loops removed), docs with id % 37 = 5
    // stripped of ALL out-links so the dangling-mass path is genuinely
    // exercised. 3 damped rounds from uniform init; top-50 by rank.
    // Scale shape: per round, ONE shuffle of (dst, contrib) pairs + a
    // map-side-combining agg; dangling mass rides an in-plan scalar
    // subquery (no driver row collect); top-50 via orderBy().limit(50)
    // → TakeOrderedAndProject (per-partition top-k), not a global sort.
    // The oracle unrolls all 3 rounds with identical quantization — a
    // hash match proves every iteration, not just the final ordering.
    QueryDef(
      "q6n_pagerank",
      Some(s"""WITH $EdgeCtes,
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT doc_id AS id,
            round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9) + 0 AS r
          FROM documents),
        ${oracleRound(1)},
        ${oracleRound(2)},
        ${oracleRound(3)}
        SELECT id, r AS pr FROM r3 ORDER BY pr DESC, id LIMIT 50"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        graft.operators.PageRank.run(nodes, edges, iters = 3)
          .orderBy(col("pr").desc, col("id"))
          .limit(50)
          .orderBy(col("pr").desc, col("id"))
      }),

    // Label propagation (community detection) over the same pseudo-link
    // graph: 2 SYNCHRONOUS rounds (async update order would be
    // scheduler-dependent — un-oracle-able), deterministic argmax
    // (most-frequent neighbor label, ties → smallest). All-integer
    // algebra, so the unrolled oracle matches with zero quantization.
    // Output is the community-size profile. Scale shape: per round one
    // (node, neighborLabel) shuffle + two hash aggs on narrow rows —
    // the clustering complement to PageRank's ranking on the same
    // Pregel template.
    QueryDef(
      "q6p_label_propagation",
      Some(s"""WITH $EdgeCtes,
        eu AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        l0 AS (SELECT doc_id AS id, doc_id AS lab FROM documents),
        c1 AS (SELECT eu.src AS nid, l0.lab, COUNT(*) AS cnt
               FROM eu JOIN l0 ON eu.dst = l0.id GROUP BY 1, 2),
        b1 AS (SELECT nid, lab,
                 row_number() OVER (PARTITION BY nid ORDER BY cnt DESC, lab) AS rk
               FROM c1),
        l1 AS (SELECT l0.id, COALESCE(b.lab, l0.lab) AS lab
               FROM l0 LEFT JOIN (SELECT nid, lab FROM b1 WHERE rk = 1) b
                 ON l0.id = b.nid),
        c2 AS (SELECT eu.src AS nid, l1.lab, COUNT(*) AS cnt
               FROM eu JOIN l1 ON eu.dst = l1.id GROUP BY 1, 2),
        b2 AS (SELECT nid, lab,
                 row_number() OVER (PARTITION BY nid ORDER BY cnt DESC, lab) AS rk
               FROM c2),
        l2 AS (SELECT l1.id, COALESCE(b.lab, l1.lab) AS lab
               FROM l1 LEFT JOIN (SELECT nid, lab FROM b2 WHERE rk = 1) b
                 ON l1.id = b.nid)
        SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l2 GROUP BY 1 ORDER BY community"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        graft.operators.LabelPropagation.run(nodes, edges, iters = 2)
          .groupBy(col("lab").as("community"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("community"))
      }),

    // Per-node triangle counts over the same pseudo-link graph treated as
    // undirected (least/greatest canonical edges). Spark side is the
    // degree-ordered-orientation scheme ([[graft.operators.TriangleCount]]:
    // out-degree ≤ O(√m) per node, wedge fan-out ≤ O(m^1.5) on ANY degree
    // distribution); the oracle counts each a<b<c triangle once by direct
    // 3-way join (fine at oracle scale, the exact shape orientation
    // replaces at 100 TB) and credits the three corners. All-integer →
    // hash-exact.
    QueryDef(
      "q6q_triangle_count",
      Some(s"""WITH $EdgeCtes,
        und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM e WHERE src <> dst),
        tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (SELECT u AS node FROM tri
          UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri)
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM corners GROUP BY node ORDER BY node"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        graft.operators.TriangleCount.perNode(edges)
          .orderBy(col("node"))
      }),

    // 3 rounds of k-core peeling (k=3) over the undirected pseudo-link
    // graph — the graph-quality filter (link farms and tendrils peel
    // off; the dense core survives). Spark side is
    // [[graft.operators.KCore]] (per round: one degree agg + two
    // left-semi joins, all narrow integer shuffles, localCheckpoint-cut
    // lineage); the oracle unrolls the identical 3 rounds. All-integer
    // → hash-exact. Output: each survivor with its degree in the
    // surviving subgraph.
    QueryDef(
      "q6s_kcore",
      Some(s"""WITH $EdgeCtes,
        ke0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM e WHERE src <> dst),
        ${kcoreRound(1)},
        ${kcoreRound(2)},
        ${kcoreRound(3)}
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT a AS node FROM ke3 UNION ALL SELECT b FROM ke3) s
        GROUP BY node ORDER BY node"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        graft.operators.KCore.peel(edges, k = 3, rounds = 3)
          .orderBy(col("node"))
      }),

    // TrustRank (personalized PageRank): teleport + dangling mass flow
    // ONLY to a 2% trusted seed set (doc_id % 50 = 0), so authority
    // propagates outward from vetted documents and disconnected link
    // farms score exactly zero — the seed-based quality-weighting
    // technique for crawl corpora. Same per-round shuffles and
    // quantization algebra as q6n (the oracle unrolls all 3 rounds; a
    // hash match proves every iteration). Top-50 by trust score.
    QueryDef(
      "q6u_trustrank",
      Some(s"""WITH $EdgeCtes,
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        sn AS (SELECT COUNT(*) AS ns FROM documents WHERE doc_id % 50 = 0),
        r0 AS (SELECT doc_id AS id,
            CASE WHEN doc_id % 50 = 0
                 THEN round(1.0 / (SELECT ns FROM sn), 9)
                 ELSE 0.0 END AS r
          FROM documents),
        ${trustRound(1)},
        ${trustRound(2)},
        ${trustRound(3)}
        SELECT id, r AS trust FROM r3 ORDER BY trust DESC, id LIMIT 50"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        val seeds = nodes.filter(col("id") % 50 === 0)
        graft.operators.PageRank.runPersonalized(nodes, seeds, edges, iters = 3)
          .select(col("id"), col("pr").as("trust"))
          .orderBy(col("trust").desc, col("id"))
          .limit(50)
          .orderBy(col("trust").desc, col("id"))
      }),

    // Strongly connected components over the DIRECTED pseudo-link graph —
    // the mutual-endorsement-ring detector WCC can't express (WCC merges
    // everything one undirected path touches; SCC requires reachability
    // BOTH ways, so a link farm pointing at a page it can't be reached
    // from stays separate). Spark side is the FW-BW scheme
    // ([[graft.operators.Scc]]: trim + forward/backward min-reachability
    // with CC's hook+shortcut, labels settle where the two minima agree).
    // The ORACLE is algorithm-independent: a recursive-CTE transitive
    // closure defines scc(v) = min{u : u⇄v mutually reachable} — the
    // canonical answer any correct SCC algorithm must produce, so a hash
    // match proves the distributed trim/settle rounds reach exactly the
    // textbook fixpoint (fine at oracle scale; the closure is the
    // all-pairs shape FW-BW exists to avoid at 100 TB). Output: each
    // node with its SCC label plus the component size profile check via
    // n_members of its component.
    QueryDef(
      "q6v_scc",
      Some(s"""WITH RECURSIVE $EdgeCtes,
        dn AS (SELECT doc_id AS id FROM documents),
        reach(s, t) AS (
          SELECT id, id FROM dn
          UNION
          SELECT r.s, e.dst FROM reach r JOIN e ON r.t = e.src),
        mutual AS (SELECT a.s AS u, a.t AS v
          FROM reach a JOIN reach b ON a.s = b.t AND a.t = b.s),
        lab AS (SELECT u AS doc_id, MIN(v) AS scc FROM mutual GROUP BY u),
        sz AS (SELECT scc, CAST(COUNT(*) AS BIGINT) AS n_members
               FROM lab GROUP BY scc)
        SELECT l.doc_id, l.scc, s.n_members
        FROM lab l JOIN sz s USING (scc) ORDER BY l.doc_id"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        val lab = graft.operators.Scc.run(nodes, edges)
          .select(col("node").as("doc_id"), col("scc"))
        val sz = lab.groupBy(col("scc")).agg(count(lit(1)).as("n_members"))
        lab.join(sz, Seq("scc"))
          .select(col("doc_id"), col("scc"), col("n_members"))
          .orderBy(col("doc_id"))
      }),

    // Landmark BFS distances ([[graft.operators.Bfs]]): unweighted
    // shortest-path hops from the graph's 4 highest-in-degree hubs
    // (count DESC, id ASC — the engine argmax tie-break) to every
    // reachable node within 12 hops. TrustRank (q6u) measures how much
    // seed authority REACHES a node; this measures how FAR it travels —
    // crawl depth, spam distance, frontier tiers. The oracle walks the
    // same horizon with a recursive CTE and takes MIN(d) per (source,
    // node); the engine's level-synchronous frontier must agree exactly
    // (its first-arrival distances ARE the min — a frontier that
    // revisits or skips a level shows immediately).
    QueryDef(
      "q97_landmark_bfs",
      Some(s"""WITH RECURSIVE $EdgeCtes,
        ind AS (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst),
        lm AS (SELECT dst AS l FROM ind ORDER BY c DESC, dst LIMIT 4),
        walk(l, v, d) AS (
          SELECT l, l, 0 FROM lm
          UNION
          SELECT w.l, e.dst, w.d + 1
          FROM walk w JOIN e ON e.src = w.v WHERE w.d < 12)
        SELECT v AS doc_id, l AS landmark, CAST(MIN(d) AS BIGINT) AS dist
        FROM walk GROUP BY v, l ORDER BY doc_id, landmark"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        val lm = edges.groupBy(col("dst")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("dst")).limit(4)
          .select(col("dst").as("l"))
        graft.operators.Bfs.distances(lm, edges, 12)
          .select(col("node").as("doc_id"), col("l").as("landmark"),
            col("dist"))
          .orderBy(col("doc_id"), col("landmark"))
      }),

    // Co-citation similarity: two documents are similar when the same
    // page links to BOTH (Small 1973) — the link-structure counterpart
    // of content near-dup, and the classic related-pages primitive. One
    // self-join of the edge list on src (id_a < id_b kills mirror
    // pairs), count distinct co-citing sources per pair. Scale shape:
    // the pair fan-out is bounded by Σ outdeg² — out-degree is capped
    // (3 here; real crawls cap at extraction), so this never goes
    // quadratic in the corpus, and only (src, dst_pair) longs shuffle.
    QueryDef(
      "q95_cocitation",
      Some(s"""WITH $EdgeCtes
        SELECT a.dst AS id_a, b.dst AS id_b,
          CAST(COUNT(DISTINCT a.src) AS BIGINT) AS n_cociting
        FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
        GROUP BY a.dst, b.dst
        ORDER BY id_a, id_b"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val e = pseudoEdges(nodes, nCount)
        val a = e.select(col("src"), col("dst").as("id_a"))
        val b = e.select(col("src").as("b_src"), col("dst").as("id_b"))
        a.join(b, col("src") === col("b_src") && col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(countDistinct(col("src")).as("n_cociting"))
          .orderBy(col("id_a"), col("id_b"))
      }),

    // Neighbor feature aggregation — the message-passing round of every
    // graph neural network, as a relational operator: x_k(v) =
    // (x_{k−1}(v) + mean of in-neighbors' x_{k−1}) / 2, nodes without
    // in-edges keep their value; two rounds over the n_chars feature.
    // Per round ONE (dst, Σfeature, count) shuffle of 24-byte rows — the
    // corpus-scale shape of feature smoothing / label propagation with
    // continuous labels. The algebra runs in micro-unit INTEGERS (×10⁶,
    // floor division for mean and blend): a double formulation puts
    // round-to-nearest at repeating-decimal boundaries (mean of
    // integers = denominator-of-indegree rationals, the worst case) and
    // the two engines' double rounding diverges in the last ulp;
    // integer floor-div is bit-exact everywhere and loses < 1e-6 per
    // round, invisible at feature scale.
    QueryDef(
      "q98_neighbor_agg",
      Some(s"""WITH $EdgeCtes,
        x0 AS (SELECT doc_id AS id, n_chars * 1000000 AS x
               FROM documents),
        a1 AS (SELECT e.dst AS id, SUM(x0.x) // COUNT(*) AS m
          FROM e JOIN x0 ON e.src = x0.id GROUP BY e.dst),
        x1 AS (SELECT x0.id,
            CASE WHEN a1.id IS NULL THEN x0.x
                 ELSE (x0.x + a1.m) // 2 END AS x
          FROM x0 LEFT JOIN a1 ON x0.id = a1.id),
        a2 AS (SELECT e.dst AS id, SUM(x1.x) // COUNT(*) AS m
          FROM e JOIN x1 ON e.src = x1.id GROUP BY e.dst),
        x2 AS (SELECT x1.id,
            CASE WHEN a2.id IS NULL THEN x1.x
                 ELSE (x1.x + a2.m) // 2 END AS x
          FROM x1 LEFT JOIN a2 ON x1.id = a2.id)
        SELECT id AS doc_id, CAST(x AS BIGINT) AS feature_micro
        FROM x2 ORDER BY doc_id"""),
      (s, dir) => {
        val d = docs(s, dir)
        val nodes = d.select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val e = pseudoEdges(nodes, nCount)
        def propagate(x: DataFrame): DataFrame = {
          val msgs = e.join(x, e("src") === x("id"))
            .groupBy(e("dst").as("m_id"))
            .agg(expr("sum(x) div count(1)").as("m"))
          x.join(msgs, x("id") === msgs("m_id"), "left")
            .select(x("id"),
              when(col("m_id").isNull, col("x"))
                .otherwise(expr("(x + m) div 2")).as("x"))
        }
        val x0 = d.select(col("doc_id").as("id"),
          (col("n_chars") * 1000000L).as("x"))
        propagate(propagate(x0))
          .select(col("id").as("doc_id"),
            col("x").cast("long").as("feature_micro"))
          .orderBy(col("doc_id"))
      }),

    // HITS hubs & authorities ([[graft.operators.Hits]], Kleinberg 1999):
    // the two-role link score PageRank can't express — directory/link-list
    // pages (high hub) are navigation boilerplate to down-weight in a
    // training corpus, high-authority pages are quality anchors. Two full
    // mutual-recursion iterations, L1-normalized each half-step (the
    // total rides an in-plan scalar subquery), PageRank's decimal-sum +
    // 9-decimal quantization idiom throughout. The oracle unrolls all
    // four half-steps — a hash match proves every iteration, both
    // normalizations, and the sink/source zero handling.
    QueryDef(
      "q99_hits",
      Some(s"""WITH $EdgeCtes,
        h0 AS (SELECT doc_id AS id, CAST(1.0 AS DOUBLE) AS hub
               FROM documents),
        ${hitsHalf(1, "h0", "hub", "src", "dst", "ar", "auth", "a")},
        ${hitsHalf(1, "a1", "auth", "dst", "src", "hr", "hub", "h")},
        ${hitsHalf(2, "h1", "hub", "src", "dst", "ar", "auth", "a")},
        ${hitsHalf(2, "a2", "auth", "dst", "src", "hr", "hub", "h")}
        SELECT a2.id AS doc_id, a2.auth, h2.hub
        FROM a2 JOIN h2 ON a2.id = h2.id ORDER BY doc_id"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = pseudoEdges(nodes, nCount)
        graft.operators.Hits.run(nodes, edges, 2)
          .select(col("id").as("doc_id"), col("auth"), col("hub"))
          .orderBy(col("doc_id"))
      }),

    // Adamic–Adar link prediction (Adamic & Adar 2003) on the citation
    // pattern: two pages that both link to the same target are related,
    // and a RARE shared target says more than a hub everyone cites — so
    // each common out-neighbor z contributes 1/ln(indeg(z)), bibliographic
    // coupling with rarity weighting (the related-pages / link-suggestion
    // score). A shared neighbor has indeg ≥ 2 by construction, so
    // ln(indeg) ≥ ln 2 and the weight is always finite. Shape: one edge
    // self-join on dst (src_a < src_b kills mirrors), indeg frame joins
    // on dst; pair fan-out is Σ indeg² with extraction-capped degrees —
    // linear in the corpus, and only id/weight longs+doubles shuffle.
    // Determinism: ln quantized to 9, reciprocal term to 12, per-pair
    // DECIMAL(30,14) sum, final round(·, 9) — the q9d/PageRank idiom.
    // Top-100 via TakeOrderedAndProject.
    QueryDef(
      "q9e_adamic_adar",
      Some(s"""WITH $EdgeCtes,
        ind AS (SELECT dst, COUNT(*) AS indeg FROM e GROUP BY dst),
        pr AS (SELECT a.src AS id_a, b.src AS id_b,
            round(1.0 / round(ln(ind.indeg), 9), 12) + 0 AS w
          FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
               JOIN ind ON a.dst = ind.dst)
        SELECT id_a, id_b,
          round(CAST(SUM(CAST(w AS DECIMAL(30,14))) AS DOUBLE), 9) + 0
            AS aa_score
        FROM pr GROUP BY id_a, id_b
        ORDER BY aa_score DESC, id_a, id_b LIMIT 100"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val e = pseudoEdges(nodes, nCount)
        val ind = e.groupBy(col("dst")).agg(count(lit(1)).as("indeg"))
        val a = e.select(col("src").as("id_a"), col("dst"))
        val b = e.select(col("src").as("id_b"), col("dst").as("b_dst"))
        a.join(b, col("dst") === col("b_dst") && col("id_a") < col("id_b"))
          .join(ind, Seq("dst"))
          .select(col("id_a"), col("id_b"),
            round(lit(1.0) / round(log(col("indeg")), 9), 12).as("w"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(round(sum(col("w").cast("decimal(30,14)")).cast("double"), 9)
            .as("aa_score"))
          .orderBy(col("aa_score").desc, col("id_a"), col("id_b"))
          .limit(100)
      })
,

    // Negative sampling for link-prediction training — the training-set
    // construction step q9e's scorer (or any GNN link model) consumes:
    // every true edge is a positive, and per node 3 hash-derived
    // candidate pairs are drawn with a DIFFERENT salt than the edge
    // generator, then anti-joined against the real edge set — so a
    // sampled negative is GUARANTEED a non-edge (hash collisions with
    // true edges are removed exactly, not probabilistically), the draw is
    // reproducible at any cluster size (no RNG state, stable under
    // retries), and the classes land ≈1:1 balanced. Shape: candidate
    // fan-out is a row-local explode on the node frame; the only
    // exchange is the narrow (src, dst) anti-join — 16-byte rows.
    QueryDef(
      "q9l_negative_sampling",
      Some(s"""WITH $EdgeCtes,
        cand0 AS (SELECT doc_id AS src,
            (doc_id * 40503241 + (i.i + 7) * 2654435761) % 999983
              % (SELECT n FROM nn) AS dst
          FROM documents, (SELECT unnest([0, 1, 2]) AS i) i),
        cand AS (SELECT DISTINCT src, dst FROM cand0 WHERE dst <> src),
        neg AS (SELECT c.src, c.dst FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM e
                            WHERE e.src = c.src AND e.dst = c.dst))
        SELECT src, dst, 1 AS label FROM e
        UNION ALL SELECT src, dst, 0 AS label FROM neg
        ORDER BY src, dst, label"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val e = pseudoEdges(nodes, nCount)
        val cand = nodes
          .select(col("id").as("src"),
            explode(sequence(lit(0), lit(2))).as("i"))
          .select(col("src"),
            ((col("src") * lit(40503241L)
              + (col("i") + lit(7)) * lit(2654435761L))
              % 999983L % nCount).as("dst"))
          .filter(col("dst") =!= col("src"))
          .distinct()
        val neg = cand.join(e, Seq("src", "dst"), "left_anti")
        e.withColumn("label", lit(1))
          .unionByName(neg.withColumn("label", lit(0)))
          .orderBy(col("src"), col("dst"), col("label"))
      })
,

    // Weighted shortest paths (bounded-hop Bellman–Ford) from the q97
    // landmarks, edge costs 1..9 hash-derived: q97 counts HOPS, this
    // sums COSTS — latency-weighted link distance / crawl-cost
    // budgeting, and the operator family where pointer-jumping can't
    // help because distance composes additively (see [[Sssp]]). The
    // 8-round bound is part of the semantics: d = min cost over paths
    // of ≤ 8 edges, and the oracle unrolls exactly 8 relaxations (the
    // PageRank unroll discipline — a hash match proves every round).
    // Pure integer arithmetic: no quantization needed anywhere.
    QueryDef(
      "q9q_weighted_sssp",
      Some(s"""WITH $EdgeCtes,
        ws AS (SELECT src, dst, 1 + (src * 31 + dst) % 9 AS w FROM e),
        ind AS (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst),
        lm AS (SELECT dst AS l FROM ind ORDER BY c DESC, dst LIMIT 4),
        d0 AS (SELECT l, l AS node, 0 AS d FROM lm),
        ${(1 to 8).map(k =>
          s"""d$k AS (SELECT l, node, MIN(d) AS d FROM (
               SELECT l, node, d FROM d${k - 1}
               UNION ALL
               SELECT p.l, w.dst, p.d + w.w FROM d${k - 1} p
               JOIN ws w ON w.src = p.node) GROUP BY l, node)""")
          .mkString(",\n        ")}
        SELECT node AS doc_id, l AS landmark, CAST(d AS BIGINT) AS dist
        FROM d8 ORDER BY doc_id, landmark"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val e = pseudoEdges(nodes, nCount)
        val we = e.select(col("src"), col("dst"),
          (lit(1L) + (col("src") * 31 + col("dst")) % 9).as("w"))
        val lm = e.groupBy(col("dst")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("dst")).limit(4)
          .select(col("dst").as("l"))
        graft.operators.Sssp.distances(lm, we, 8)
          .select(col("node").as("doc_id"), col("l").as("landmark"),
            col("d").as("dist"))
          .orderBy(col("doc_id"), col("landmark"))
      })
,

    // Authority-weighted canonical selection — dedup meets the link
    // graph: documents sharing the same 5-token opening prefix form a
    // template/mirror family (the boilerplate-opening heuristic of
    // crawl cleanup), and the member to KEEP is the family's highest-
    // PageRank page, not q6d's longest/lowest-id — at web scale the
    // mirror with inbound links is the original, the orphan is the
    // copy. Composition: q6n's full 3-round PageRank (oracle unrolls
    // every round) joined onto the family grouping; canonical = argmax
    // (rank, then min id) per family via one max_by hash agg — partial
    // aggregation collapses families map-side, no per-family window.
    // Only (prefix-hash, id, rank) rows shuffle; bodies stay on the
    // scan.
    QueryDef(
      "q9y_canonical_authority",
      Some(s"""WITH $EdgeCtes,
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT doc_id AS id,
            round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9) + 0 AS r
          FROM documents),
        ${oracleRound(1)},
        ${oracleRound(2)},
        ${oracleRound(3)},
        g AS (SELECT doc_id,
            array_to_string((string_split(text, ' '))[1:5], ' ') AS k
          FROM documents),
        fam AS (SELECT k FROM g GROUP BY k HAVING COUNT(*) > 1),
        m AS (SELECT g.k, g.doc_id, r3.r FROM g
              JOIN fam USING (k) JOIN r3 ON r3.id = g.doc_id),
        c AS (SELECT k, doc_id, r,
                row_number() OVER (PARTITION BY k
                  ORDER BY r DESC, doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY k) AS n_members,
                MIN(doc_id) OVER (PARTITION BY k) AS family_id
              FROM m)
        SELECT family_id, CAST(n_members AS BIGINT) AS n_members,
          doc_id AS canonical_id, r AS canonical_pr
        FROM c WHERE rn = 1 ORDER BY family_id"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val pr = graft.operators.PageRank
          .run(nodes, pseudoEdges(nodes, nCount), iters = 3)
        val g = docs(s, dir).select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("k"))
        val fam = g.groupBy(col("k")).agg(count(lit(1)).as("nm"))
          .filter(col("nm") > 1)
        g.join(fam, Seq("k"))
          .join(pr, g("doc_id") === pr("id"))
          .groupBy(col("k"))
          .agg(min(col("doc_id")).as("family_id"),
            max(col("nm")).cast("long").as("n_members"),
            max_by(struct(col("doc_id"), col("pr")),
              struct(col("pr"), (-col("doc_id")).as("nd"))).as("c"))
          .select(col("family_id"), col("n_members"),
            col("c.doc_id").as("canonical_id"), col("c.pr").as("canonical_pr"))
          .orderBy(col("family_id"))
      })
  )

  /** One unrolled HITS half-step in DuckDB SQL (must stay in lockstep
    * with [[graft.operators.Hits]].halfStep): scores `prev.(scoreCol)`
    * flow along edges joined on `joinSide`, sum by `groupSide` as exact
    * DECIMAL(30,12), L1-normalize by the in-CTE total, quantize to 9
    * decimals; nodes receiving nothing score 0. Emits CTEs
    * `<rawPfx><k>`, `<rawPfx>s<k>`, `<outPfx><k>(id, <outCol>)`. */
  private def hitsHalf(k: Int, prev: String, scoreCol: String,
      joinSide: String, groupSide: String, rawPfx: String,
      outCol: String, outPfx: String): String =
    s"""$rawPfx$k AS (SELECT e.$groupSide AS id,
           CAST(SUM(CAST(p.$scoreCol AS DECIMAL(30,12))) AS DOUBLE) AS raw
         FROM e JOIN $prev p ON e.$joinSide = p.id GROUP BY e.$groupSide),
       ${rawPfx}s$k AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(30,12))) AS DOUBLE) AS s
         FROM $rawPfx$k),
       $outPfx$k AS (SELECT d.doc_id AS id,
           round(COALESCE(r.raw, 0.0) / (SELECT s FROM ${rawPfx}s$k), 9) + 0
             AS $outCol
         FROM documents d LEFT JOIN $rawPfx$k r ON d.doc_id = r.id)"""

  /** One unrolled TrustRank round in DuckDB SQL — the q6n algebra with
    * the teleport/dangling mass restricted to the seed set (must stay in
    * lockstep with [[graft.operators.PageRank.runPersonalized]]). */
  private def trustRound(k: Int): String = {
    val prev = s"r${k - 1}"
    s"""d$k AS (SELECT CAST(COALESCE(SUM(CAST(r AS DECIMAL(30,12))), 0) AS DOUBLE) AS d
         FROM $prev LEFT JOIN deg ON $prev.id = deg.src WHERE deg.src IS NULL),
       c$k AS (SELECT e.dst AS id,
           CAST(SUM(CAST(round($prev.r / deg.outdeg, 12) AS DECIMAL(30,14))) AS DOUBLE) AS c
         FROM e JOIN $prev ON e.src = $prev.id JOIN deg ON e.src = deg.src
         GROUP BY e.dst),
       r$k AS (SELECT $prev.id,
           round(CAST(0.85 AS DOUBLE) * COALESCE(c$k.c, 0.0)
             + CASE WHEN $prev.id % 50 = 0
                    THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT ns FROM sn)
                       + CAST(0.85 AS DOUBLE) * ((SELECT d FROM d$k) / (SELECT ns FROM sn))
                    ELSE 0.0 END, 9) + 0 AS r
         FROM $prev LEFT JOIN c$k ON $prev.id = c$k.id)"""
  }

  /** One unrolled k-core peeling round in DuckDB SQL (threshold 3):
    * degrees over the surviving edge set, keep ≥ 3, restrict edges to
    * kept endpoints — must stay in lockstep with
    * [[graft.operators.KCore.peel]]. */
  private def kcoreRound(r: Int): String = {
    val prev = s"ke${r - 1}"
    s"""deg$r AS (SELECT node, count(*) AS d FROM (
          SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev) s
        GROUP BY node),
       keep$r AS (SELECT node FROM deg$r WHERE d >= 3),
       ke$r AS (SELECT p.a, p.b FROM $prev p
          JOIN keep$r ka ON ka.node = p.a
          JOIN keep$r kb ON kb.node = p.b)"""
  }
}

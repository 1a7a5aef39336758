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
               + (SELECT d FROM d$k) / (SELECT n FROM nn)), 9) AS r
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
      Some(s"""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        e0 AS (SELECT doc_id AS src,
            (doc_id * 2654435761 + i.i * 40503241) % 999983
              % (SELECT n FROM nn) AS dst
          FROM documents, (SELECT unnest([0, 1, 2]) AS i) i),
        e AS (SELECT DISTINCT src, dst FROM e0
          WHERE dst <> src AND src % 37 <> 5),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT doc_id AS id,
            round(CAST(1.0 AS DOUBLE) / (SELECT n FROM nn), 9) AS r
          FROM documents),
        ${oracleRound(1)},
        ${oracleRound(2)},
        ${oracleRound(3)}
        SELECT id, r AS pr FROM r3 ORDER BY pr DESC, id LIMIT 50"""),
      (s, dir) => {
        val nodes = docs(s, dir).select(col("doc_id").as("id"))
        val nCount = nodes.agg(count(lit(1)).as("n")).scalar()
        val edges = nodes
          .select(col("id").as("src"),
            explode(sequence(lit(0), lit(2))).as("i"))
          .select(col("src"),
            ((col("src") * lit(2654435761L) + col("i") * lit(40503241L))
              % 999983L % nCount).as("dst"))
          .filter(col("dst") =!= col("src") && col("src") % 37 =!= 5)
          .distinct()
        graft.operators.PageRank.run(nodes, edges, iters = 3)
          .orderBy(col("pr").desc, col("id"))
          .limit(50)
          .orderBy(col("pr").desc, col("id"))
      })
  )
}

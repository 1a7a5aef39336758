package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set by Luby's algorithm (Luby 1986, SIAM J.
  * Comput. — "A simple parallel algorithm for the maximal independent
  * set problem"), over the near-duplicate pair graph: the
  * coverage-MAXIMIZING dedup keep policy. q6d keeps ONE canonical per
  * duplicate cluster; an MIS keeps a maximal set of documents no two of
  * which are near-duplicates — strictly more of the corpus survives
  * while the no-dup invariant still holds, and every dropped document
  * is witnessed by a kept neighbor (the property that makes the drop
  * defensible).
  *
  * Deterministic, oracle-replayable form: round r gives every UNDECIDED
  * node the priority
  *   p(v, r) = ((v·2654435761 + r·40503) mod 1000003) · 2^20 + v
  * (the qao id algebra; the +v term makes priorities distinct for
  * v < 2^20 — corpus ids here are far below that, and the bound is part
  * of the operator spec, not a silent assumption). A node joins the set
  * iff its priority is strictly below every undecided neighbor's
  * (distinct priorities ⇒ the winners are independent); neighbors of
  * winners drop out; [[Rounds]] rounds unrolled, the leftover reported
  * as an explicit 'undecided' status rather than silently truncated.
  * Isolated documents win round 1 by the empty-neighborhood rule.
  *
  * Scale shape: each round is two narrow shuffles on the (shrinking)
  * undecided subgraph — a (node, min neighbor priority) aggregation and
  * a neighbor-of-winner semi join; per-round state is one row per
  * undecided node, lineage-cut. Luby's theorem gives O(log N) expected
  * rounds; the per-round decided counts in the output make the actual
  * decay readable. */
object LubyMis {

  /** Unrolled rounds (both engines; leftovers stay 'undecided'). */
  val Rounds = 4

  private def priority(node: org.apache.spark.sql.Column, r: Int) =
    (((node * 2654435761L + lit(r) * 40503L) % 1000003L) * 1048576L
      + node).as("p")

  /** qay: (doc_id, status, decided_round) for every node in `nodes` —
    * status in {'in','out','undecided'}, decided_round = 0 when
    * undecided. `edges` is an undirected (id_a, id_b) pair list. */
  def run(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = IterationCheckpoint.cut(
      edges.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionByName(edges.select(col("id_b").as("a"), col("id_a").as("b"))))
    var und = IterationCheckpoint.cut(nodes.select(col("doc_id").as("node")))
    val decided = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to Rounds) {
      val undEdges = sym
        .join(und.select(col("node").as("a")), Seq("a"), "semi")
        .join(und.select(col("node").as("b")), Seq("b"), "semi")
      val nbrMin = undEdges
        .select(col("a").as("node"), priority(col("b"), r))
        .groupBy(col("node")).agg(min(col("p")).as("nmin"))
      val winners = und
        .join(nbrMin, Seq("node"), "left")
        .filter(priority(col("node"), r) <
          coalesce(col("nmin"), lit(Long.MaxValue)))
        .select(col("node"))
      val losers = undEdges
        .join(winners.select(col("node").as("a")), Seq("a"), "semi")
        .select(col("b").as("node")).distinct()
      decided += winners.select(col("node"), lit("in").as("status"),
        lit(r).as("decided_round"))
      decided += losers.select(col("node"), lit("out").as("status"),
        lit(r).as("decided_round"))
      und = IterationCheckpoint.cut(
        und.join(winners, Seq("node"), "anti")
          .join(losers, Seq("node"), "anti"))
    }
    decided += und.select(col("node"), lit("undecided").as("status"),
      lit(0).as("decided_round"))
    decided.reduce(_ unionByName _)
      .select(col("node").as("doc_id"), col("status"),
        col("decided_round").cast("int").as("decided_round"))
      .orderBy(col("doc_id"))
  }

  /** The same unrolled rounds as DuckDB CTEs. `edgesCte` must provide
    * (id_a, id_b); `nodesSql` a (doc_id) relation. */
  def oracleSql(edgesCte: String, nodesSql: String): String = {
    def prio(c: String, r: Int) =
      s"(($c * 2654435761 + $r * 40503) % 1000003) * 1048576 + $c"
    val rounds = (1 to Rounds).map { r =>
      val pu = s"u${r - 1}"
      s"""ue$r AS MATERIALIZED (
         |  SELECT s.a, s.b FROM sym s
         |  JOIN $pu x ON x.node = s.a JOIN $pu y ON y.node = s.b),
         |nm$r AS MATERIALIZED (
         |  SELECT a AS node, min(${prio("b", r)}) AS nmin
         |  FROM ue$r GROUP BY a),
         |in$r AS MATERIALIZED (
         |  SELECT u.node FROM $pu u LEFT JOIN nm$r m ON m.node = u.node
         |  WHERE ${prio("u.node", r)}
         |    < COALESCE(m.nmin, 9223372036854775807)),
         |out$r AS MATERIALIZED (
         |  SELECT DISTINCT e.b AS node FROM ue$r e
         |  JOIN in$r w ON w.node = e.a),
         |u$r AS MATERIALIZED (
         |  SELECT node FROM $pu
         |  WHERE node NOT IN (SELECT node FROM in$r)
         |    AND node NOT IN (SELECT node FROM out$r))""".stripMargin
    }.mkString(",\n")
    val statusSel = ((1 to Rounds).flatMap { r =>
      Seq(s"SELECT node, 'in' AS status, $r AS decided_round FROM in$r",
        s"SELECT node, 'out' AS status, $r AS decided_round FROM out$r")
    } :+ s"SELECT node, 'undecided' AS status, 0 AS decided_round " +
      s"FROM u$Rounds").mkString(" UNION ALL ")
    // edgesCte is concatenated OUTSIDE the stripMargin template: its
    // body may wrap a `||` concat onto a line starting with '|', which
    // stripMargin would truncate to a broken single '|'
    edgesCte + ",\n" +
      s"""sym AS MATERIALIZED (
         |  SELECT id_a AS a, id_b AS b FROM jp
         |  UNION ALL SELECT id_b, id_a FROM jp),
         |u0 AS MATERIALIZED (SELECT doc_id AS node FROM ($nodesSql)),
         |$rounds
         |SELECT node AS doc_id, status, CAST(decided_round AS INT)
         |  AS decided_round
         |FROM ($statusSel) ORDER BY doc_id""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parallel greedy maximal matching by LOCAL MAX (Preis 1999; the
  * Manne–Bisseling distributed formulation) — the one-to-one ASSIGNMENT
  * step of entity resolution: q9k/qa4 emit scored candidate pairs, but
  * a record may appear in many pairs; linking requires each record to
  * match at most once, greedily preferring higher similarity. The
  * sequential greedy scan (sort all pairs, take each if both ends free)
  * is inherently serial; local-max is its parallel equivalent: a pair
  * locks in iff it is the best incident pair of BOTH endpoints — such
  * pairs are mutually non-conflicting, lock simultaneously, and the
  * result equals a greedy matching under the same priority order.
  *
  * Deterministic form: pair priority = (sim DESC, id_a ASC, id_b ASC) —
  * total over any vertex's incident set, so per-vertex argmax is
  * unambiguous. [[Rounds]] rounds unrolled on both engines; pairs still
  * live at the horizon report an explicit 'open' status (the qay
  * convention: a cap is a spec, not a silent truncation), and pairs
  * eliminated because an endpoint matched elsewhere report 'dropped' —
  * the full disposition of every candidate pair is in the hash.
  *
  * Scale shape: each round is one narrow per-vertex argmax aggregation
  * (map-side combinable min over a priority struct) + two equi
  * semi/anti joins to retire matched vertices — state shrinks every
  * round, nothing is ever quadratic in the pair count. */
object LocalMaxMatching {

  /** Unrolled rounds (both engines). */
  val Rounds = 4

  /** qb0: full disposition of every candidate pair (id_a, id_b, sim,
    * status in {'matched','dropped','open'}, matched_round, 0 when not
    * matched). `pairs` columns: id_a < id_b, sim (round-6 double). */
  def run(pairs: DataFrame): DataFrame = {
    val p0 = IterationCheckpoint.cut(
      pairs.select(col("id_a"), col("id_b"), col("sim")))
    var live = p0
    val matched = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to Rounds) {
      val pr = struct(col("sim"), (-col("id_a")).as("na"),
        (-col("id_b")).as("nb"))
      val inc = live.select(col("id_a").as("v"), pr.as("p"))
        .unionByName(live.select(col("id_b").as("v"), pr.as("p")))
      val best = inc.groupBy(col("v")).agg(max(col("p")).as("bp"))
      val locked = live
        .join(best.select(col("v").as("id_a"), col("bp").as("ba")),
          Seq("id_a"))
        .join(best.select(col("v").as("id_b"), col("bp").as("bb")),
          Seq("id_b"))
        .filter(pr === col("ba") && pr === col("bb"))
        .select(col("id_a"), col("id_b"), col("sim"))
      matched += locked.select(col("id_a"), col("id_b"), col("sim"),
        lit(r).as("matched_round"))
      val mv = IterationCheckpoint.cut(
        locked.select(col("id_a").as("v"))
          .unionByName(locked.select(col("id_b").as("v"))).distinct())
      live = IterationCheckpoint.cut(live
        .join(mv.select(col("v").as("id_a")), Seq("id_a"), "anti")
        .join(mv.select(col("v").as("id_b")), Seq("id_b"), "anti"))
    }
    val m = matched.reduce(_ unionByName _)
    val open = live.select(col("id_a"), col("id_b"), col("sim"),
      lit(0).as("matched_round"), lit("open").as("status"))
    val dropped = p0
      .join(m.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "anti")
      .join(live.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"),
        "anti")
      .select(col("id_a"), col("id_b"), col("sim"),
        lit(0).as("matched_round"), lit("dropped").as("status"))
    m.withColumn("status", lit("matched"))
      .unionByName(open).unionByName(dropped)
      .select(col("id_a"), col("id_b"), col("sim"), col("status"),
        col("matched_round").cast("int").as("matched_round"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The same unrolled rounds as DuckDB CTEs over a pair CTE `p0`
    * providing (id_a, id_b, sim). Concatenated outside stripMargin —
    * the embedded CTE may wrap `||` across lines (the LubyMis lesson). */
  def oracleSql(pairsCte: String): String = {
    val rounds = (1 to Rounds).map { r =>
      val prev = s"p${r - 1}"
      s"""inc$r AS MATERIALIZED (
         |  SELECT id_a AS v, sim, id_a, id_b FROM $prev
         |  UNION ALL SELECT id_b, sim, id_a, id_b FROM $prev),
         |best$r AS MATERIALIZED (
         |  SELECT v, id_a AS ba, id_b AS bb FROM (
         |    SELECT v, id_a, id_b, row_number() OVER (PARTITION BY v
         |      ORDER BY sim DESC, id_a, id_b) AS rn FROM inc$r)
         |  WHERE rn = 1),
         |lock$r AS MATERIALIZED (
         |  SELECT p.id_a, p.id_b, p.sim FROM $prev p
         |  JOIN best$r x ON x.v = p.id_a AND x.ba = p.id_a AND x.bb = p.id_b
         |  JOIN best$r y ON y.v = p.id_b AND y.ba = p.id_a AND y.bb = p.id_b),
         |mv$r AS MATERIALIZED (
         |  SELECT id_a AS v FROM lock$r UNION SELECT id_b FROM lock$r),
         |p$r AS MATERIALIZED (
         |  SELECT * FROM $prev
         |  WHERE id_a NOT IN (SELECT v FROM mv$r)
         |    AND id_b NOT IN (SELECT v FROM mv$r))""".stripMargin
    }.mkString(",\n")
    val matchedSel = (1 to Rounds)
      .map(r => s"SELECT id_a, id_b, sim, 'matched' AS status, " +
        s"$r AS matched_round FROM lock$r")
      .mkString(" UNION ALL ")
    pairsCte + ",\n" +
      s"""$rounds,
         |m AS MATERIALIZED ($matchedSel),
         |fin AS (
         |  SELECT * FROM m
         |  UNION ALL
         |  SELECT id_a, id_b, sim, 'open', 0 FROM p$Rounds
         |  UNION ALL
         |  SELECT p.id_a, p.id_b, p.sim, 'dropped', 0 FROM p0 p
         |  WHERE NOT EXISTS (SELECT 1 FROM m
         |          WHERE m.id_a = p.id_a AND m.id_b = p.id_b)
         |    AND NOT EXISTS (SELECT 1 FROM p$Rounds l
         |          WHERE l.id_a = p.id_a AND l.id_b = p.id_b))
         |SELECT id_a, id_b, sim, status,
         |  CAST(matched_round AS INT) AS matched_round
         |FROM fin ORDER BY id_a, id_b""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Window-function surface (SURVEY.md §2.6) + sort/limit/top-k (§2.7).
  *
  * Scale notes: window partitions shuffle on the partition key once; Spark
  * spills per-partition frames (`ExternalAppendOnlyUnsafeRowArray`) so wide
  * frames survive memory pressure. The global top-k (q25) plans as
  * `TakeOrderedAndProject` — per-partition heaps, no total sort, no single
  * fat reducer.
  *
  * Running sums are computed over DECIMAL so prefix order (deterministic)
  * is the only thing that matters and both engines agree bit-for-bit.
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q20_window_ranking",
      Some("""SELECT c_mktsegment, c_custkey, acctbal,
        CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
        CAST(drnk AS INT) AS drnk, CAST(quartile AS INT) AS quartile
      FROM (
        SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) + 0 AS acctbal,
          ROW_NUMBER() OVER w AS rn,
          RANK() OVER w AS rnk,
          DENSE_RANK() OVER w AS drnk,
          NTILE(4) OVER w AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ) WHERE rn <= 5 ORDER BY c_mktsegment, rn"""),
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(
            col("c_mktsegment"), col("c_custkey"),
            round(col("c_acctbal"), 2).as("acctbal"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter(col("rn") <= 5)
          .orderBy(col("c_mktsegment"), col("rn"))
      }),

    QueryDef(
      "q21_window_analytic",
      Some("""SELECT o_orderkey, o_custkey,
        ROUND(LAG(o_totalprice) OVER w, 2) + 0 AS prev_price,
        ROUND(LEAD(o_totalprice) OVER w, 2) + 0 AS next_price,
        ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) + 0 AS first_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
            round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
            round(first(col("o_totalprice")).over(w), 2).as("first_price"))
          .orderBy(col("o_orderkey"))
      }),

    QueryDef(
      "q22_window_running",
      Some("""SELECT o_orderkey, o_custkey,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) + 0 AS running_spend,
        CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_so_far
        FROM orders ORDER BY o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            round(sum(col("o_totalprice").cast(DecimalType(30, 8))).over(w)
              .cast("double"), 2).as("running_spend"),
            count(lit(1)).over(w).cast("long").as("n_so_far"))
          .orderBy(col("o_orderkey"))
      }),

    QueryDef(
      "q23_window_range_frame",
      Some("""SELECT o_orderkey,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
          OVER (PARTITION BY o_custkey
                ORDER BY date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE), 2) + 0 AS trailing_30d
        FROM orders ORDER BY o_orderkey"""),
      (s, dir) => {
        val withDays = t(s, dir, "orders")
          .withColumn("days", datediff(col("o_orderdate"), lit("1995-01-01").cast("date")))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("days"))
          .rangeBetween(-30, 0)
        withDays
          .select(
            col("o_orderkey"),
            round(sum(col("o_totalprice").cast(DecimalType(30, 8))).over(w)
              .cast("double"), 2).as("trailing_30d"))
          .orderBy(col("o_orderkey"))
      }),

    QueryDef(
      "q24_topk_per_group",
      Some("""SELECT o_orderpriority, o_orderkey, price, CAST(rn AS INT) AS rn
        FROM (
        SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) + 0 AS price,
          ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3
        ORDER BY o_orderpriority, rn"""),
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_orderpriority"), col("rn"))
      }),

    QueryDef(
      "q25_top_global",
      Some("""SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) + 0 AS price
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 2).as("price"),
            col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100)
          .drop("l_extendedprice")),

    // Skyline / Pareto-frontier extraction (Börzsönyi, Kossmann &
    // Stocker 2001, ICDE — "The Skyline Operator"): the
    // multi-criteria-optimal subset no single ORDER BY can produce —
    // here every customer not dominated on (total spend, account
    // balance), both maximized. The oracle IS the dominance definition
    // (a NOT EXISTS anti-join, quadratic); the engine computes the same
    // frontier in the 2-D special form that scales: sort by spend DESC
    // and a point is on the frontier iff its balance strictly exceeds
    // the running max balance over all STRICTLY greater spends (and
    // tops its own spend group). That running extreme is NOT a global
    // single-task window: per-spend group maxima (narrow agg) get
    // StableIds' two-phase range-partitioned numbering + running max,
    // and the strictly-greater shift is an equi join on sid-1 — every
    // stage keyed and parallel. Doubles quantize to cents via
    // floor(x*100+0.5) BEFORE any aggregation, so sums are exact
    // integers on both engines (the UnigramLm quantization idiom).
    QueryDef(
      "qaz_skyline",
      Some("""WITH sp AS (
          SELECT o_custkey,
            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT) AS spend
          FROM orders GROUP BY o_custkey),
        pts AS (
          SELECT c.c_custkey,
            CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal, s.spend
          FROM customer c JOIN sp s ON s.o_custkey = c.c_custkey)
        SELECT p.c_custkey, p.spend AS spend_cents, p.bal AS bal_cents,
          CAST(CASE WHEN NOT EXISTS (
            SELECT 1 FROM pts q
            WHERE q.spend >= p.spend AND q.bal >= p.bal
              AND (q.spend > p.spend OR q.bal > p.bal))
          THEN 1 ELSE 0 END AS INT) AS sky
        FROM pts p ORDER BY c_custkey"""),
      (s, dir) => skylineFlags(custPoints(s, dir))
        .select(col("c_custkey"), col("spend").as("spend_cents"),
          col("bal").as("bal_cents"), col("sky"))
        .orderBy(col("c_custkey")))
  )

  /** qaz/q8w shared: per-customer (c_custkey, spend, bal) points —
    * doubles quantized to cents BEFORE aggregation so sums are exact
    * integers on both engines. */
  private[graft] def custPoints(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("ct"))
      .groupBy(col("o_custkey")).agg(sum(col("ct")).as("spend"))
    t(s, dir, "customer")
      .select(col("c_custkey"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal"))
      .join(spend, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("spend"), col("bal"))
  }

  /** The 2-D skyline flags over a (c_custkey, spend, bal) frame — the
    * scale form (see the qaz QueryDef comment): per-spend group maxima,
    * StableIds two-phase numbering + running max, sid-1 shift join. */
  private[graft] def skylineFlags(pts: DataFrame): DataFrame = {
    import graft.operators.StableIds
    val grp = pts.groupBy(col("spend")).agg(max(col("bal")).as("gmax"))
    val keyed = StableIds.runningMax(
      StableIds.assign(grp, Seq(col("spend").desc), 32, "sid"),
      Seq(col("spend").desc), col("gmax"), 32, "mincl")
    val withExcl = keyed.join(
      keyed.select((col("sid") + 1).as("sid"), col("mincl").as("mexcl")),
      Seq("sid"), "left")
    // plain equi join on spend — the group table can approach N
    // distinct values, so no broadcast hint (AQE may still pick one
    // when it is actually small)
    pts.join(withExcl.select(col("spend"), col("gmax"),
        col("mexcl")), Seq("spend"))
      .select(col("c_custkey"), col("spend"), col("bal"),
        when(col("bal") === col("gmax") &&
            (col("mexcl").isNull || col("bal") > col("mexcl")), 1)
          .otherwise(0).cast("int").as("sky"))
  }
}

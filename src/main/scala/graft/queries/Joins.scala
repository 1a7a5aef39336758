package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.queries.Aggregates.dsum

/** Join surface (SURVEY.md §2.4, Tier B/C — the reference contains zero
  * joins; this is the relational middle its host pipeline would supply).
  *
  * Scale notes (100 TB):
  *   - dimension tables (region/nation/customer at TPC-H ratios) are
  *     broadcast — no shuffle of the fact side;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key once and
  *     AQE splits skewed partitions at runtime;
  *   - semi/anti joins ship only the key column of the right side;
  *   - the theta join keeps an equi prefix (nationkey) so it plans as a
  *     shuffled hash/SMJ with a residual inequality filter, never a
  *     nested-loop over the full cross product;
  *   - the as-of join is the union+running-last trick: one shuffle on
  *     (user_id), one sort, no per-row probes — the standard scalable
  *     pattern when ranges are unbounded.
  */
object Joins {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** qd3's filtered probe's scan constant (priced by qaf's histogram,
    * applied for real in the executed tree). Declared ABOVE `all`: the
    * query list is a val whose construction forces the lazy oracle
    * text — a later declaration would interpolate the default 0.0
    * (object-init order). */
  private val SelingerFilterC = 25000.0

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q10_join_inner",
      Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) =>
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("c_mktsegment"))),

    QueryDef(
      "q11_join_multiway",
      Some("""SELECT r_name, n_name, COUNT(*) AS n_items,
        ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS revenue
        FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
      (s, dir) => {
        val dims = broadcast(
          t(s, dir, "region")
            .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
            .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey")))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        o.join(dims, col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      }),

    QueryDef(
      "q12_join_left",
      Some("""SELECT c_mktsegment, COUNT(*) AS n_rows,
        COUNT(o_orderkey) AS n_orders,
        COUNT(DISTINCT c_custkey) AS n_customers
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_orders"),
            countDistinct(col("c_custkey")).as("n_customers"))
          .orderBy(col("c_mktsegment"))),

    QueryDef(
      "q13_join_right",
      Some("""SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_customers,
        COUNT(o_orderkey) AS n_orders
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey"""),
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
          .groupBy(col("c_nationkey"))
          .agg(
            countDistinct(col("c_custkey")).as("n_customers"),
            count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_nationkey"))),

    QueryDef(
      "q14_join_full",
      Some("""SELECT COALESCE(c.nk, sp.nk) AS nationkey,
        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
              WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
              WHERE s_acctbal > 9000 GROUP BY s_nationkey) sp
        ON c.nk = sp.nk
        ORDER BY nationkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_cust"))
        val sp = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_supp"))
        c.join(sp, col("c_nk") === col("s_nk"), "full")
          .select(
            coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0)).cast("long").as("n_cust"),
            coalesce(col("n_supp"), lit(0)).cast("long").as("n_supp"))
          .orderBy(col("nationkey"))
      }),

    QueryDef(
      "q15_join_semi",
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        ORDER BY c_custkey"""),
      (s, dir) => {
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        t(s, dir, "customer")
          .join(big, col("o_custkey") === col("c_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      }),

    QueryDef(
      "q16_join_anti",
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey"""),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))),

    QueryDef(
      "q17_join_theta",
      Some("""SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
        FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
        GROUP BY s_nationkey ORDER BY nationkey"""),
      (s, dir) =>
        t(s, dir, "supplier")
          .join(
            t(s, dir, "customer"),
            col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("nationkey"))),

    // As-of join: for each purchase event, the most recent click by the same
    // user at or before the purchase. DuckDB has native ASOF JOIN (the
    // oracle); Spark-side we use the scalable union + running-last pattern:
    // tag both sides, sort within user by (ts, side), and carry the last
    // non-null click id forward — one shuffle, one sort, O(n) state.
    //
    // Tie contract (q18 and the q1b-q1e native family): right-side
    // timestamps are unique per user in this dataset (nanosecond event
    // times), so the engines never have to agree on WHICH of two
    // equal-timestamp clicks wins — DuckDB's ASOF pick among exact ties is
    // unspecified while this pattern takes the larger click_id. Data with
    // colliding (user, ts) pairs must pre-aggregate the right side (e.g.
    // max(click_id) per (user, ts)) on BOTH engines to pin the tie.
    QueryDef(
      "q18_join_asof",
      Some("""SELECT p.event_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns"), col("event_id").as("click_id"),
            lit(null).cast("long").as("p_id"), lit(0).as("side"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns"), lit(null).cast("long").as("click_id"),
            col("event_id").as("p_id"), lit(1).as("side"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("side"), col("click_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        clicks.unionByName(purchases)
          .withColumn("last_click", last(col("click_id"), ignoreNulls = true).over(w))
          .filter(col("p_id").isNotNull)
          .select(col("p_id").as("event_id"), col("last_click").as("click_id"))
          .orderBy(col("event_id"))
      }),

    // Same as-of semantics as q18, but through the engine's NATIVE as-of
    // join operator (graft.plans.AsOfJoin: custom LogicalPlan + Strategy +
    // SparkPlan, one shuffle + sort per side, single-pass merge) instead of
    // the union + running-last window fallback. Same DuckDB ASOF oracle —
    // the check proves the custom operator's semantics exactly.
    QueryDef(
      "q1b_join_asof_native",
      Some("""SELECT p.event_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns"), col("event_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts_ns").as("c_ts"),
            col("event_id").as("click_id"))
        graft.plans.AsOfJoinOps
          .asofJoin(s, purchases, clicks, "user_id", "c_user", "ts_ns", "c_ts")
          .select(col("event_id"), col("click_id"))
          .orderBy(col("event_id"))
      }),

    // As-of with tolerance (pandas merge_asof(tolerance=...)): matches
    // further back than 30 minutes are nulled. The oracle expresses the
    // same thing as ASOF + a CASE on the matched gap.
    QueryDef(
      "q1c_join_asof_tolerance",
      Some("""SELECT p.event_id,
          CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE THEN c.event_id END AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ns"), col("event_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts_ns").as("c_ts"),
            col("event_id").as("click_id"))
        graft.plans.AsOfJoinOps
          .asofJoin(s, purchases, clicks, "user_id", "c_user", "ts_ns", "c_ts",
            toleranceNs = Some(1800L * 1000000000L))
          .select(col("event_id"), col("click_id"))
          .orderBy(col("event_id"))
      }),

    // Forward as-of: each click matched to the NEXT purchase by the same
    // user (time-to-conversion analysis). Same native operator, forward
    // direction; DuckDB ASOF with a flipped inequality is the oracle.
    QueryDef(
      "q1d_join_asof_forward",
      Some("""SELECT c.event_id, p.event_id AS next_purchase_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts <= p.ts
        ORDER BY c.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts_ns").as("p_ts"),
            col("event_id").as("next_purchase_id"))
        graft.plans.AsOfJoinOps
          .asofJoin(s, clicks, purchases, "user_id", "p_user", "ts_ns", "p_ts",
            forward = true)
          .select(col("event_id"), col("next_purchase_id"))
          .orderBy(col("event_id"))
      }),

    // Broadcast as-of: the orders timeline is dimension-sized, so it ships
    // whole to every executor and the event side is aligned by binary
    // search — zero shuffle, zero sort of the big side. Output is the
    // matched time (not an order id): o_orderdate has day granularity, so
    // ties among same-day orders would make any id column nondeterministic.
    QueryDef(
      "q1e_join_asof_broadcast",
      Some("""SELECT e.event_id, o.o_orderdate AS last_order_date
        FROM events e
        ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id"), col("ts"), col("event_id"))
        val orders = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderdate"))
        graft.plans.AsOfJoinOps
          .asofJoin(s, ev, orders, "user_id", "o_custkey", "ts", "o_orderdate",
            broadcastRight = true)
          .select(col("event_id"), col("o_orderdate").as("last_order_date"))
          .orderBy(col("event_id"))
      }),

    // Range join (point-in-interval) via fixed-width binning — the join
    // family's remaining scale gap: q17's theta join keeps an equi prefix,
    // but a PURE range predicate ("which campaign windows contain this
    // click?") has none, and the naive condition plans as a nested loop
    // over the cross product. graft.operators.RangeJoin explodes each
    // interval onto the 1-hour bins it overlaps, maps each point to its
    // one bin, and equi-joins on the bin id with the exact range as a
    // residual filter — a plain shuffled hash join on an integer key
    // (O(points + intervals·bins/interval) shuffled rows). Intervals here
    // are 1-5h attribution windows opened by every 97th purchase; the
    // LEFT join back to the interval table keeps zero-click windows in
    // the result (the operator's inner pairs alone would drop them).
    // Plan gate: PlanSpec asserts no CartesianProduct and no
    // BroadcastNestedLoopJoin anywhere in q1f's executed plan.
    QueryDef(
      "q1f_join_range",
      Some("""WITH iv AS (
          SELECT event_id AS iv_id, epoch_ns(ts) AS lo,
                 epoch_ns(ts) + (1 + event_id % 5) * 3600000000000 AS hi
          FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0),
        pts AS (SELECT epoch_ns(ts) AS p_ts, event_id AS p_id
                FROM events WHERE event_type = 'click')
        SELECT iv.iv_id, count(p.p_id) AS n_clicks,
               CAST(coalesce(sum(p.p_id), 0) AS BIGINT) AS sum_click_ids
        FROM iv LEFT JOIN pts p ON p.p_ts >= iv.lo AND p.p_ts < iv.hi
        GROUP BY iv.iv_id ORDER BY iv_id"""),
      (s, dir) => {
        val hourNs = 3600000000000L
        val ev = t(s, dir, "events")
        val iv = ev
          .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
          .select(col("event_id").as("iv_id"), col("ts_ns").as("lo"),
            (col("ts_ns") + (col("event_id") % 5 + 1) * hourNs).as("hi"))
        val pts = ev.filter(col("event_type") === "click")
          .select(col("ts_ns").as("p_ts"), col("event_id").as("p_id"))
        val pairs = graft.operators.RangeJoin
          .pointInInterval(iv, "lo", "hi", pts, "p_ts", binWidth = hourNs)
        val counts = pairs.groupBy(col("iv_id"))
          .agg(count(lit(1)).as("n"), sum(col("p_id")).as("sids"))
        iv.join(counts, Seq("iv_id"), "left")
          .select(col("iv_id"),
            coalesce(col("n"), lit(0L)).as("n_clicks"),
            coalesce(col("sids"), lit(0L)).as("sum_click_ids"))
          .orderBy(col("iv_id"))
      }),

    // Interval-OVERLAP join (interval × interval) — the remaining range
    // shape after q1f's point-in-interval: "which attribution windows
    // overlap which onboarding windows" has two interval sides and NO
    // equi prefix, so the raw predicate (loA < hiB AND loB < hiA) again
    // plans a nested loop over the cross product. RangeJoin.intervalOverlap
    // explodes BOTH sides onto fixed 1-hour bins and equi-joins on the bin
    // id; because overlapping intervals co-reside in every bin their
    // intersection spans, each pair is kept only in its FIRST common bin
    // (max of the two start bins — a residual filter, not a dedup
    // shuffle). Exactly-once is property-tested in RangeJoinPropSpec; the
    // no-nested-loop plan is gated in PlanSpec.
    QueryDef(
      "q1i_join_interval_overlap",
      Some("""WITH a AS (
          SELECT event_id AS a_id, epoch_ns(ts) AS a_lo,
                 epoch_ns(ts) + (1 + event_id % 5) * 3600000000000 AS a_hi
          FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0),
        b AS (
          SELECT event_id AS b_id, epoch_ns(ts) AS b_lo,
                 epoch_ns(ts) + (1 + event_id % 3) * 3600000000000 AS b_hi
          FROM events WHERE event_type = 'signup' AND event_id % 53 = 0)
        SELECT a.a_id, count(b.b_id) AS n_overlaps,
               CAST(coalesce(sum(b.b_id), 0) AS BIGINT) AS sum_overlap_ids
        FROM a LEFT JOIN b ON a.a_lo < b.b_hi AND b.b_lo < a.a_hi
        GROUP BY a.a_id ORDER BY a_id"""),
      (s, dir) => {
        val hourNs = 3600000000000L
        val ev = t(s, dir, "events")
        val a = ev
          .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
          .select(col("event_id").as("a_id"), col("ts_ns").as("a_lo"),
            (col("ts_ns") + (col("event_id") % 5 + 1) * hourNs).as("a_hi"))
        val b = ev
          .filter(col("event_type") === "signup" && col("event_id") % 53 === 0)
          .select(col("event_id").as("b_id"), col("ts_ns").as("b_lo"),
            (col("ts_ns") + (col("event_id") % 3 + 1) * hourNs).as("b_hi"))
        val pairs = graft.operators.RangeJoin
          .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi",
            binWidth = hourNs)
        val counts = pairs.groupBy(col("a_id"))
          .agg(count(lit(1)).as("n"), sum(col("b_id")).as("bids"))
        a.join(counts, Seq("a_id"), "left")
          .select(col("a_id"),
            coalesce(col("n"), lit(0L)).as("n_overlaps"),
            coalesce(col("bids"), lit(0L)).as("sum_overlap_ids"))
          .orderBy(col("a_id"))
      }),

    // Salted skew join: the manual skew-mitigation pattern for when AQE
    // can't help (hot key known, both sides too big to broadcast). The
    // probe side gets a deterministic salt from a unique column; the build
    // side is replicated across all salts; the join key becomes
    // (key, salt), spreading each hot key over S partitions. Result is
    // provably identical to the plain join — which is exactly what the
    // oracle states.
    QueryDef(
      "q19_join_salted",
      Some("""SELECT p_brand, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand"""),
      (s, dir) => {
        val S = 8
        val li = t(s, dir, "lineitem").withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(S)).cast("int"))
        val part = t(s, dir, "part")
          .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
        li.join(part,
            li("l_partkey") === part("p_partkey") && li("salt") === part("salt"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("p_brand"))
      }),

    // Sampled join-cardinality estimation — the planner-side operator a
    // join needs BEFORE it runs at 100 TB: will orders⋈lineitem on the
    // DATE key (a genuinely many-to-many join, unlike the FK equi joins
    // above) explode, and is the cheap estimator trustworthy? Estimator:
    // uniform 1/16 key-space sample by the q5o Knuth multiplicative hash
    // of the epoch day (deterministic, engine-identical, and a function
    // of the KEY — every occurrence of a sampled key on both sides is
    // kept, the textbook correlated-sampling requirement; row-level
    // Bernoulli would square the inclusion probability and bias Σ cA·cB
    // down), est = 16·Σ_sampled cO(d)·cL(d). The output is the
    // estimator's eval table: per month, estimate vs exact with err_ppm.
    // Scale shape: ONE map-side-combined day-level aggregate per side
    // (the shuffle carries |days| rows, not the corpus), one broadcast
    // join of the two day frames, and both statistics fold from that
    // shared frame — the corpus is never joined row-to-row at all; the
    // actual join's |output| is computed without materializing it.
    QueryDef(
      "qad_join_size_estimate",
      Some(joinSizeOracleSql),
      (s, dir) =>
        joinSizeEval(ordersDayStats(t(s, dir, "orders")),
          lineitemDayCounts(s, dir))),

    // Incremental statistics maintenance — the lifecycle that keeps the
    // qad estimator ALIVE at 100 TB: statistics are a PERSISTED catalog
    // artifact, and each ingest batch folds in as a new generation
    // through a narrow day-frame merge (full-outer on the |days|-row
    // frames, counts added) — the standing corpus is never re-scanned to
    // refresh its stats, where a re-ANALYZE per ingest would pay a
    // corpus pass every time (the qa8 build/serve/merge story applied to
    // the stats catalog). Two ingest generations chain here (v0 from the
    // 50% snapshot, +batch1 → v1, +batch2 → v2) and the estimator serves
    // THROUGH the final generation: sharing qad's oracle verbatim proves
    // merged ≡ recomputed-from-scratch across the chain — counts are
    // integers, so the equality is bit-exact, not approximate.
    QueryDef(
      "qaj_incremental_stats",
      Some(joinSizeOracleSql),
      (s, dir) => {
        val v0p = QueryDef.materializePath(dir, "qaj_stats_v0.parquet")
        val v1p = QueryDef.materializePath(dir, "qaj_stats_v1.parquet")
        val v2p = QueryDef.materializePath(dir, "qaj_stats_v2.parquet")
        val ord = t(s, dir, "orders")
          .select(pmod(col("o_orderkey"), lit(4L)).as("g"),
            col("o_orderdate"))
        // generation 0: the standing snapshot's catalog entry
        ordersDayStats(ord.filter(col("g") >= 2))
          .write.mode("overwrite").parquet(v0p)
        // fold an ingest batch into the catalog WITHOUT touching the
        // snapshot: narrow full-outer on the day frames, counts added
        def merge(prev: String, batch: org.apache.spark.sql.DataFrame,
            out: String): Unit =
          mergeDayStats(s.read.parquet(prev), ordersDayStats(batch))
            .write.mode("overwrite").parquet(out)
        merge(v0p, ord.filter(col("g") === 1), v1p)
        merge(v1p, ord.filter(col("g") === 0), v2p)
        // serve the estimator through the final catalog generation
        joinSizeEval(s.read.parquet(v2p), lineitemDayCounts(s, dir))
      }),

    // Stats-driven join ordering — the capstone that makes the CBO-stats
    // family (qad estimate / qaf selectivity / qaj+qak maintenance)
    // actually DECIDE something: a 3-table star query
    // (lineitem ⋈ orders ⋈ customer) has two left-deep orders, the
    // planner prices both from the PERSISTED stats catalog with the
    // textbook containment formula |R⋈S| = |R|·|S| div max(ndv_R(k),
    // ndv_S(k)) and C_out cost (intermediate + final estimate, integer
    // div in a fixed sequence), picks the cheaper (tie → name ASC), and
    // EXECUTES the picked order. Reading the 2-row priced frame onto the
    // driver is the planner's plan-time action (catalog-sized, the same
    // metadata read Spark's own CBO does) — corpus rows never move. The
    // output carries the full pricing table, the pick, and the executed
    // result, so the oracle replays the pricing ALGEBRA and the pick
    // rule, not just the final answer. At TPC-H ratios the estimates
    // price orders⋈customer (≈|orders|) under lineitem⋈orders
    // (≈|lineitem|), so the plan builds the dimension-side intermediate
    // first — PlanSpec pins that shape and the broadcast. Headroom (qab
    // rule): pricing multiplies two row counts before the div — int64
    // holds to ~3e9 rows per table; past that price in decimal(38,0).
    QueryDef(
      "qam_join_order",
      Some(joinOrderOracleSql),
      (s, dir) => {
        val cat = QueryDef.materializePath(dir, "qam_catalog.parquet")
        starCatalog(s, dir).write.mode("overwrite").parquet(cat)
        joinOrderRun(s, dir, s.read.parquet(cat))
      }),

    // Selinger DP join ordering over the 4-table chain — qam priced the
    // two left-deep orders of a 3-table star; this is the full System-R
    // lattice (Selinger et al. 1979) over lineitem–orders–customer–
    // nation WITH a filtered probe: the scan predicate
    // `l_extendedprice <= 25000` is priced by qaf's equi-depth
    // histogram (the composed-stats step — selectivity feeds
    // cardinality feeds join order), every CONNECTED subset of the
    // chain gets a containment estimate (canonical-order integer folds,
    // fixed div sequence) and a C_out cost = own estimate + cheapest
    // split, INCLUDING the bushy split (LO)(CN) a left-deep-only
    // enumerator never prices. At TPC-H ratios the bushy plan WINS —
    // the filtered fact⋈fact intermediate (~|σL|) plus the tiny
    // dimension⋈dimension side (~|C|) undercuts both left-deep chains —
    // and the engine executes exactly the picked tree. Output = the
    // full priced lattice + the picked plan string + the executed
    // result, so the oracle replays the histogram estimate, the DP
    // algebra, the argmin pick and the answer. Driver-side reads stay
    // catalog-sized (one 1-row pricing frame — the metadata read every
    // cost-based planner does at plan time). Headroom (qam's rule):
    // pricing multiplies two int64 row counts before each div — fine to
    // ~3e9 rows per table, price in decimal(38,0) past that.
    // WHERE THE MODEL AND AQE CAN DISAGREE (round-16, ScaleProbe
    // `selingeraqe` at 8x/32x): the lattice prices C_out under
    // shuffles-only costs (the 100 TB regime where nothing broadcasts);
    // at runtime AQE re-plans the picked shape's exchanges — once C⋈N
    // (or even O⋈C⋈N) measures under the broadcast threshold it
    // broadcasts inside ANY shape, which compresses the bushy-vs-
    // left-deep gap toward zero. The pick therefore only has to stay
    // non-WORSE under AQE, and the probe confirms it does: the shapes
    // converge to near-identical walls with the dimension joins
    // broadcast, while in the shuffle regime (broadcasts disabled) the
    // bushy pick keeps its measured ~21% win over the worst chain.
    QueryDef(
      "qd3_selinger_bushy",
      Some(selingerOracleSql),
      (s, dir) => {
        val cat = QueryDef.materializePath(dir, "qd3_catalog.parquet")
        selingerCatalog(s, dir).write.mode("overwrite").parquet(cat)
        selingerRun(s, dir, s.read.parquet(cat))
      })
  )

  /** qad/qaj shared oracle: the full-table join-size eval (for qaj this
    * IS the rebuild measure — merged catalog ≡ stats recomputed from
    * scratch, hash-checked). */
  private lazy val joinSizeOracleSql: String =
    """WITH co AS (SELECT
                 date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) AS d,
                 strftime(o_orderdate, '%Y-%m') AS mon, COUNT(*) AS nco
               FROM orders GROUP BY 1, 2),
        cl AS (SELECT
                 date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS d,
                 COUNT(*) AS ncl
               FROM lineitem GROUP BY 1),
        j AS (SELECT co.mon, co.nco * cl.ncl AS r,
                CASE WHEN ((co.d % 1000003) * 2654435761) % 16 = 0
                  THEN 1 ELSE 0 END AS samp
              FROM co JOIN cl USING (d)),
        a AS (SELECT mon, COUNT(*) AS n_days, SUM(r) AS actual_rows,
                16 * SUM(CASE WHEN samp = 1 THEN r ELSE 0 END) AS est_rows
              FROM j GROUP BY mon)
        SELECT mon, CAST(n_days AS BIGINT) AS n_days,
          CAST(est_rows AS BIGINT) AS est_rows,
          CAST(actual_rows AS BIGINT) AS actual_rows,
          CAST(ABS(est_rows - actual_rows) * 1000000
            // NULLIF(actual_rows, 0) AS BIGINT) AS err_ppm
        FROM a ORDER BY mon"""

  /** Day-level orders statistics — the qad/qaj "catalog entry" frame:
    * (epoch day, month, order count), one map-side-combined aggregate. */
  /** Fold a batch's day-stats frame into a prior catalog generation —
    * narrow full-outer on (d, mon), counts added; the prior generation
    * is consumed as a frame (the query reads it from parquet), never
    * recomputed from its source rows. */
  private[graft] def mergeDayStats(prev: DataFrame,
      batchStats: DataFrame): DataFrame =
    prev.withColumnRenamed("nco", "nco_a")
      .join(batchStats.withColumnRenamed("nco", "nco_b"),
        Seq("d", "mon"), "full_outer")
      .select(col("d"), col("mon"),
        (coalesce(col("nco_a"), lit(0L))
          + coalesce(col("nco_b"), lit(0L))).as("nco"))

  private[graft] def ordersDayStats(orders: DataFrame): DataFrame =
    orders
      .select(datediff(col("o_orderdate"), lit("1970-01-01"))
          .cast("long").as("d"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .groupBy(col("d"), col("mon")).agg(count(lit(1)).as("nco"))

  private def lineitemDayCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(datediff(col("l_shipdate"), lit("1970-01-01"))
        .cast("long").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("ncl"))

  /** The qad estimator eval: per month, 1/16 correlated-key-sample
    * estimate vs exact Σ nco·ncl, err_ppm — over a (d, mon, nco) orders
    * stats frame and the lineitem day frame (both aggregated; the eval
    * never sees corpus rows). Headroom note (the qab_t_closeness rule):
    * all arithmetic is int64 while the DuckDB oracle promotes to
    * 128-bit — est_rows = 16·Σ nco·ncl must stay under 2^63 (fine up to
    * ~5e17 joined rows/month, i.e. ~7e8 orders × 7e8 lineitems sharing
    * a day within one month), and err_ppm's |est−actual|·1e6 bounds the
    * same product at ~9e12 per month. Past that the engine overflows
    * silently BEFORE the oracle does — at larger SFs compute err_ppm in
    * decimal(38,0) or pre-divide the sample scale. */
  private def joinSizeEval(co: DataFrame, cl: DataFrame): DataFrame =
    co.join(broadcast(cl), Seq("d"))
      .withColumn("r", col("nco") * col("ncl"))
      .withColumn("samp",
        when(pmod((col("d") % 1000003L) * 2654435761L, lit(16L)) === 0, 1)
          .otherwise(0))
      .groupBy(col("mon"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("r")).as("actual_rows"),
        (sum(when(col("samp") === 1, col("r")).otherwise(0L)) * 16)
          .as("est_rows"))
      .select(col("mon"), col("n_days"), col("est_rows"),
        col("actual_rows"),
        expr("abs(est_rows - actual_rows) * 1000000 div nullif(actual_rows, 0)")
          .as("err_ppm"))
      .orderBy(col("mon"))

  // ------------------------------------------------------ qam join order

  /** qam's ANALYZE artifact: one row per star table with exact row and
    * join-key NDV statistics — what the planner consumes. One aggregate
    * pass per table (count + exact count-distinct on the join keys). */
  private[graft] def starCatalog(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("ndv_ok"))
      .select(lit("lineitem").as("tbl"), col("n_rows"), col("ndv_ok"),
        lit(0L).as("ndv_ck"))
    val ord = t(s, dir, "orders")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("ndv_ok"),
        countDistinct(col("o_custkey")).as("ndv_ck"))
      .select(lit("orders").as("tbl"), col("n_rows"), col("ndv_ok"),
        col("ndv_ck"))
    val cust = t(s, dir, "customer")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("c_custkey")).as("ndv_ck"))
      .select(lit("customer").as("tbl"), col("n_rows"), lit(0L).as("ndv_ok"),
        col("ndv_ck"))
    li.unionByName(ord).unionByName(cust)
  }

  /** Price both left-deep orders from the catalog, in-plan: containment
    * formula |R⋈S| = |R|·|S| div max(ndv), C_out cost = est_im +
    * est_fin, integer div in a FIXED sequence so both engines round
    * identically. The catalog rows pivot through broadcast 1-row frames. */
  private[graft] def joinOrderPricing(cat: DataFrame): DataFrame = {
    val l = cat.filter(col("tbl") === "lineitem")
      .select(col("n_rows").as("nl"), col("ndv_ok").as("l_ok"))
    val o = cat.filter(col("tbl") === "orders")
      .select(col("n_rows").as("no_"), col("ndv_ok").as("o_ok"),
        col("ndv_ck").as("o_ck"))
    val c = cat.filter(col("tbl") === "customer")
      .select(col("n_rows").as("nc"), col("ndv_ck").as("c_ck"))
    val j = l.crossJoin(broadcast(o)).crossJoin(broadcast(c))
    val a = j.select(lit("LO_then_C").as("k"),
        expr("(nl * no_) div greatest(l_ok, o_ok)").as("est_im"),
        col("nc"), col("o_ck"), col("c_ck"))
      .select(col("k"), col("est_im"),
        expr("(est_im * nc) div greatest(o_ck, c_ck)").as("est_fin"))
    val b = j.select(lit("OC_then_L").as("k"),
        expr("(no_ * nc) div greatest(o_ck, c_ck)").as("est_im"),
        col("nl"), col("l_ok"), col("o_ok"))
      .select(col("k"), col("est_im"),
        expr("(est_im * nl) div greatest(l_ok, o_ok)").as("est_fin"))
    a.unionByName(b)
      .select(col("k"), col("est_im"), (col("est_im") + col("est_fin")).as("cost"))
  }

  /** The planner's decision: argmin (cost, name) over the 2-row priced
    * frame. The collect is the plan-time catalog read every cost-based
    * planner performs on the driver — 2 rows of metadata, never corpus. */
  private[graft] def pickOrder(pricing: DataFrame): String =
    pricing.select(col("cost"), col("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).min._2

  /** Execute the star query in the given left-deep order. The dimension
    * (customer) broadcasts in both orders; the order decides WHICH
    * intermediate materializes between the two shuffling fact joins. */
  private[graft] def starJoin(s: SparkSession, dir: String,
      pick: String): DataFrame =
    starJoinOn(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice")),
      t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      pick)

  private[graft] def starJoinOn(li: DataFrame, ord: DataFrame,
      cust: DataFrame, pick: String, hintBroadcast: Boolean = true): DataFrame = {
    // hintBroadcast = false models the regime where the dimension does
    // NOT fit a broadcast (the 100 TB case the C_out pricing is for —
    // with a broadcastable dimension both orders shuffle each fact table
    // exactly once and genuinely tie; ScaleProbe's joinorder mode
    // measured that tie, and measures the order gap with this off)
    val c = if (hintBroadcast) broadcast(cust) else cust
    val joined =
      if (pick == "OC_then_L")
        ord.join(c, col("o_custkey") === col("c_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
      else
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("cents"))
  }

  private[graft] def joinOrderRun(s: SparkSession, dir: String,
      cat: DataFrame): DataFrame = {
    val pricing = joinOrderPricing(cat)
    val pick = pickOrder(pricing)
    val priceRows = pricing.select(lit("price").as("section"), col("k"),
      col("est_im").as("n"), col("cost").as("v"))
    val pickRow = s.range(1).select(lit("pick").as("section"),
      lit(pick).as("k"), lit(1L).as("n"), lit(0L).as("v"))
    val resRows = starJoin(s, dir, pick)
      .select(lit("result").as("section"), col("c_mktsegment").as("k"),
        col("n").cast("long").as("n"), col("cents").as("v"))
    priceRows.unionByName(pickRow).unionByName(resRows)
      .orderBy(col("section"), col("k"))
  }

  /** qam oracle: replays the catalog statistics, the containment pricing
    * algebra (same integer-div sequence), the argmin pick rule, and the
    * star result itself. */
  private lazy val joinOrderOracleSql: String =
    """WITH stl AS (SELECT COUNT(*) AS nl,
          COUNT(DISTINCT l_orderkey) AS l_ok FROM lineitem),
      sto AS (SELECT COUNT(*) AS no_, COUNT(DISTINCT o_orderkey) AS o_ok,
          COUNT(DISTINCT o_custkey) AS o_ck FROM orders),
      stc AS (SELECT COUNT(*) AS nc,
          COUNT(DISTINCT c_custkey) AS c_ck FROM customer),
      j AS (SELECT * FROM stl, sto, stc),
      price AS (
        SELECT 'LO_then_C' AS k,
          (nl * no_) // GREATEST(l_ok, o_ok) AS est_im,
          ((nl * no_) // GREATEST(l_ok, o_ok)) * nc
            // GREATEST(o_ck, c_ck) AS est_fin
        FROM j
        UNION ALL
        SELECT 'OC_then_L' AS k,
          (no_ * nc) // GREATEST(o_ck, c_ck) AS est_im,
          ((no_ * nc) // GREATEST(o_ck, c_ck)) * nl
            // GREATEST(l_ok, o_ok) AS est_fin
        FROM j),
      pr AS (SELECT k, est_im, est_im + est_fin AS cost FROM price),
      pk AS (SELECT k FROM pr ORDER BY cost, k LIMIT 1),
      res AS (
        SELECT c_mktsegment, COUNT(*) AS n,
          SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment)
      SELECT section, k, CAST(n AS BIGINT) AS n, CAST(v AS BIGINT) AS v
      FROM (
        SELECT 'price' AS section, k, est_im AS n, cost AS v FROM pr
        UNION ALL
        SELECT 'pick' AS section, k, CAST(1 AS BIGINT) AS n,
          CAST(0 AS BIGINT) AS v FROM pk
        UNION ALL
        SELECT 'result' AS section, c_mktsegment AS k, n, cents AS v
        FROM res)
      ORDER BY section, k"""

  // --------------------------------------------------- qd3 Selinger DP

  /** qd3's ANALYZE artifact: one row per chain table with row count and
    * join-key NDVs — L(l_orderkey), O(o_orderkey, o_custkey),
    * C(c_custkey, c_nationkey), N(n_nationkey). */
  private[graft] def selingerCatalog(s: SparkSession,
      dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("ndv_ok"))
      .select(lit("lineitem").as("tbl"), col("n_rows"), col("ndv_ok"),
        lit(0L).as("ndv_ck"), lit(0L).as("ndv_nk"))
    val ord = t(s, dir, "orders")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("ndv_ok"),
        countDistinct(col("o_custkey")).as("ndv_ck"))
      .select(lit("orders").as("tbl"), col("n_rows"), col("ndv_ok"),
        col("ndv_ck"), lit(0L).as("ndv_nk"))
    val cust = t(s, dir, "customer")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("c_custkey")).as("ndv_ck"),
        countDistinct(col("c_nationkey")).as("ndv_nk"))
      .select(lit("customer").as("tbl"), col("n_rows"), lit(0L).as("ndv_ok"),
        col("ndv_ck"), col("ndv_nk"))
    val nat = t(s, dir, "nation")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("n_nationkey")).as("ndv_nk"))
      .select(lit("nation").as("tbl"), col("n_rows"), lit(0L).as("ndv_ok"),
        lit(0L).as("ndv_ck"), col("ndv_nk"))
    li.unionByName(ord).unionByName(cust).unionByName(nat)
  }

  /** Price the full connected-subset lattice of the L–O–C–N chain from
    * the catalog + the histogram-estimated filtered leaf, in-plan: one
    * 1-row frame carrying every subset's containment estimate
    * (canonical-order folds, FIXED integer-div sequence) and C_out cost
    * (own estimate + cheapest split — the bushy (LO)(CN) split
    * included). */
  private[graft] def selingerLattice(cat: DataFrame,
      nlEff: DataFrame): DataFrame = {
    val l = cat.filter(col("tbl") === "lineitem")
      .select(col("ndv_ok").as("l_ok"))
    val o = cat.filter(col("tbl") === "orders")
      .select(col("n_rows").as("no_"), col("ndv_ok").as("o_ok"),
        col("ndv_ck").as("o_ck"))
    val c = cat.filter(col("tbl") === "customer")
      .select(col("n_rows").as("nc"), col("ndv_ck").as("c_ck"),
        col("ndv_nk").as("c_nk"))
    val n = cat.filter(col("tbl") === "nation")
      .select(col("n_rows").as("nn_"), col("ndv_nk").as("n_nk"))
    nlEff.crossJoin(broadcast(l)).crossJoin(broadcast(o))
      .crossJoin(broadcast(c)).crossJoin(broadcast(n))
      .withColumn("est_lo", expr("(nl_eff * no_) div greatest(l_ok, o_ok)"))
      .withColumn("est_oc", expr("(no_ * nc) div greatest(o_ck, c_ck)"))
      .withColumn("est_cn", expr("(nc * nn_) div greatest(c_nk, n_nk)"))
      .withColumn("est_loc", expr("(est_lo * nc) div greatest(o_ck, c_ck)"))
      .withColumn("est_ocn", expr("(est_oc * nn_) div greatest(c_nk, n_nk)"))
      .withColumn("est_locn",
        expr("(est_loc * nn_) div greatest(c_nk, n_nk)"))
      .withColumn("cost_lo", col("est_lo"))
      .withColumn("cost_oc", col("est_oc"))
      .withColumn("cost_cn", col("est_cn"))
      .withColumn("cost_loc", expr("est_loc + least(cost_lo, cost_oc)"))
      .withColumn("cost_ocn", expr("est_ocn + least(cost_oc, cost_cn)"))
      .withColumn("cost_locn",
        expr("est_locn + least(cost_loc, cost_lo + cost_cn, cost_ocn)"))
  }

  /** The DP's decisions from the 1-row lattice: top split over
    * {(LOC)N, (LO)(CN), L(OCN)} and the chosen composite's sub-split,
    * argmin by (cost, label ASC), rendered as the fully-parenthesized
    * plan string. One driver-side read of ONE metadata row — the
    * plan-time catalog read every cost-based planner performs. */
  private[graft] def selingerPick(lattice: DataFrame): String = {
    val r = lattice.select(
      col("cost_lo"), col("cost_oc"), col("cost_cn"),
      col("cost_loc"), col("cost_ocn")).collect()(0)
    val (lo, oc, cn, loc, ocn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val top = Seq((loc, "LOC_N"), (lo + cn, "LO_CN"), (ocn, "L_OCN")).min._2
    top match {
      case "LOC_N" =>
        if (Seq((lo, "LO_C"), (oc, "L_OC")).min._2 == "LO_C") "((LO)C)N"
        else "(L(OC))N"
      case "LO_CN" => "(LO)(CN)"
      case _ =>
        if (Seq((oc, "OC_N"), (cn, "O_CN")).min._2 == "OC_N") "L((OC)N)"
        else "L(O(CN))"
    }
  }

  /** Execute the chain query in the picked tree shape. The filtered
    * fact scan applies the REAL predicate the histogram priced; the
    * dimension sides broadcast (`hintBroadcast = false` models the
    * regime where they don't fit — ScaleProbe's `selinger` mode
    * measures the bushy-vs-left-deep gap there). */
  private[graft] def selingerJoinOn(li: DataFrame, ord: DataFrame,
      cust: DataFrame, nat: DataFrame, pick: String,
      hintBroadcast: Boolean = true): DataFrame = {
    def b(df: DataFrame) = if (hintBroadcast) broadcast(df) else df
    val ok = col("l_orderkey") === col("o_orderkey")
    val ck = col("o_custkey") === col("c_custkey")
    val nk = col("c_nationkey") === col("n_nationkey")
    val joined = pick match {
      case "((LO)C)N" => li.join(ord, ok).join(b(cust), ck).join(b(nat), nk)
      case "(L(OC))N" => li.join(ord.join(b(cust), ck), ok).join(b(nat), nk)
      case "(LO)(CN)" => li.join(ord, ok).join(b(cust.join(b(nat), nk)), ck)
      case "L((OC)N)" =>
        li.join(ord.join(b(cust), ck).join(b(nat), nk), ok)
      case "L(O(CN))" =>
        li.join(ord.join(b(cust.join(b(nat), nk)), ck), ok)
      case other => sys.error(s"selingerJoinOn: unknown plan shape '$other'")
    }
    joined.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("cents"))
  }

  private[graft] def selingerRun(s: SparkSession, dir: String,
      cat: DataFrame): DataFrame = {
    import Aggregates.{priceHistBounds, priceHistBuckets, priceHistEstimate}
    val li0 = t(s, dir, "lineitem")
    // the filtered leaf's cardinality from qaf's histogram machinery
    val nlEff = priceHistEstimate(s,
        priceHistBuckets(li0, priceHistBounds(li0)), SelingerFilterC)
      .select(floor(col("est_rows")).cast("long").as("nl_eff"))
    val lattice = selingerLattice(cat, nlEff).localCheckpoint()
    val pick = selingerPick(lattice)
    val priceRows = lattice.select(explode(array(
        struct(lit("l_eff").as("k"), col("nl_eff").as("n"), lit(0L).as("v")),
        struct(lit("lo").as("k"), col("est_lo").as("n"),
          col("cost_lo").as("v")),
        struct(lit("oc").as("k"), col("est_oc").as("n"),
          col("cost_oc").as("v")),
        struct(lit("cn").as("k"), col("est_cn").as("n"),
          col("cost_cn").as("v")),
        struct(lit("loc").as("k"), col("est_loc").as("n"),
          col("cost_loc").as("v")),
        struct(lit("ocn").as("k"), col("est_ocn").as("n"),
          col("cost_ocn").as("v")),
        struct(lit("locn").as("k"), col("est_locn").as("n"),
          col("cost_locn").as("v")))).as("p"))
      .select(lit("price").as("section"), col("p.k").as("k"),
        col("p.n").as("n"), col("p.v").as("v"))
    val pickRow = s.range(1).select(lit("pick").as("section"),
      lit(pick).as("k"), lit(1L).as("n"), lit(0L).as("v"))
    val resRows = selingerJoinOn(
        li0.filter(col("l_extendedprice") <= SelingerFilterC)
          .select(col("l_orderkey"), col("l_extendedprice")),
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        t(s, dir, "nation").select(col("n_nationkey"), col("n_name")),
        pick)
      .select(lit("result").as("section"), col("n_name").as("k"),
        col("n").cast("long").as("n"), col("cents").as("v"))
    priceRows.unionByName(pickRow).unionByName(resRows)
      .orderBy(col("section"), col("k"))
  }

  /** qd3 oracle: replays the histogram estimate for the filtered leaf
    * (qaf's own CTE chain), the four catalog stats, every connected
    * subset's containment estimate and C_out cost (same integer-div
    * sequence, bushy split priced), the two-level argmin pick with the
    * (cost, label ASC) tiebreak, and the executed chain result. */
  private lazy val selingerOracleSql: String =
    s"""WITH ${Aggregates.histBucketCtesSql("TRUE")},
      ${Aggregates.histEstCteSql("e25", SelingerFilterC.toString)},
      nle AS (SELECT CAST(floor(est_rows) AS BIGINT) AS nl_eff FROM e25),
      stl AS (SELECT COUNT(DISTINCT l_orderkey) AS l_ok FROM lineitem),
      sto AS (SELECT COUNT(*) AS no_, COUNT(DISTINCT o_orderkey) AS o_ok,
          COUNT(DISTINCT o_custkey) AS o_ck FROM orders),
      stc AS (SELECT COUNT(*) AS nc, COUNT(DISTINCT c_custkey) AS c_ck,
          COUNT(DISTINCT c_nationkey) AS c_nk FROM customer),
      stn AS (SELECT COUNT(*) AS nn_,
          COUNT(DISTINCT n_nationkey) AS n_nk FROM nation),
      j0 AS (SELECT * FROM nle, stl, sto, stc, stn),
      j1 AS (SELECT *,
          (nl_eff * no_) // GREATEST(l_ok, o_ok) AS est_lo,
          (no_ * nc) // GREATEST(o_ck, c_ck) AS est_oc,
          (nc * nn_) // GREATEST(c_nk, n_nk) AS est_cn
        FROM j0),
      j2 AS (SELECT *,
          (est_lo * nc) // GREATEST(o_ck, c_ck) AS est_loc,
          (est_oc * nn_) // GREATEST(c_nk, n_nk) AS est_ocn
        FROM j1),
      j3 AS (SELECT *,
          (est_loc * nn_) // GREATEST(c_nk, n_nk) AS est_locn,
          est_loc + LEAST(est_lo, est_oc) AS cost_loc,
          est_ocn + LEAST(est_oc, est_cn) AS cost_ocn
        FROM j2),
      lat AS (SELECT *,
          est_locn + LEAST(cost_loc, est_lo + est_cn, cost_ocn)
            AS cost_locn
        FROM j3),
      top AS (SELECT k FROM (
          SELECT 'LOC_N' AS k, cost_loc AS c FROM lat
          UNION ALL SELECT 'LO_CN', est_lo + est_cn FROM lat
          UNION ALL SELECT 'L_OCN', cost_ocn FROM lat)
        ORDER BY c, k LIMIT 1),
      subloc AS (SELECT k FROM (
          SELECT 'LO_C' AS k, est_lo AS c FROM lat
          UNION ALL SELECT 'L_OC', est_oc FROM lat)
        ORDER BY c, k LIMIT 1),
      subocn AS (SELECT k FROM (
          SELECT 'OC_N' AS k, est_oc AS c FROM lat
          UNION ALL SELECT 'O_CN', est_cn FROM lat)
        ORDER BY c, k LIMIT 1),
      pk AS (SELECT CASE
          WHEN top.k = 'LO_CN' THEN '(LO)(CN)'
          WHEN top.k = 'LOC_N' THEN
            CASE WHEN subloc.k = 'LO_C' THEN '((LO)C)N' ELSE '(L(OC))N' END
          ELSE
            CASE WHEN subocn.k = 'OC_N' THEN 'L((OC)N)' ELSE 'L(O(CN))' END
          END AS k
        FROM top, subloc, subocn),
      res AS (
        SELECT n_name, COUNT(*) AS n,
          SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_extendedprice <= $SelingerFilterC
        GROUP BY n_name)
      SELECT section, k, CAST(n AS BIGINT) AS n, CAST(v AS BIGINT) AS v
      FROM (
        SELECT 'price' AS section, 'l_eff' AS k, nl_eff AS n,
          CAST(0 AS BIGINT) AS v FROM lat
        UNION ALL SELECT 'price', 'lo', est_lo, est_lo FROM lat
        UNION ALL SELECT 'price', 'oc', est_oc, est_oc FROM lat
        UNION ALL SELECT 'price', 'cn', est_cn, est_cn FROM lat
        UNION ALL SELECT 'price', 'loc', est_loc, cost_loc FROM lat
        UNION ALL SELECT 'price', 'ocn', est_ocn, cost_ocn FROM lat
        UNION ALL SELECT 'price', 'locn', est_locn, cost_locn FROM lat
        UNION ALL SELECT 'pick', k, CAST(1 AS BIGINT),
          CAST(0 AS BIGINT) FROM pk
        UNION ALL SELECT 'result', n_name, n, cents FROM res)
      ORDER BY section, k"""
}

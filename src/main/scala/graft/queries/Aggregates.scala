package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Aggregation surface (SURVEY.md §2.5, Tier B/C).
  *
  * All hash aggregation with partial (map-side) combine is Spark-native:
  * `groupBy.agg` plans as partial+final HashAggregate with whole-stage
  * codegen; at 100 TB the partial aggregate collapses the shuffle volume to
  * |groups| × |partitions| rows, so these scale with group cardinality, not
  * input size. Rollup/cube expand grouping sets before the same aggregation
  * machinery.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Order-independent sum of a double column, rounded to 2 decimals (see
    * QueryDef docs). Scale 8 sits far below the double→decimal rounding-mode
    * noise floor (both engines agree to within ~1e-11 per row), so the
    * decimal sums differ across engines by well under the output rounding. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(30, 8))).cast("double"), 2)

  /** Unrounded variant for building averages (round the quotient instead). */
  def dsumRaw(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast("double")

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q01_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_base_price,
        ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_disc_price,
        ROUND(CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_charge,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), 2) + 0 AS avg_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), 2) + 0 AS avg_price,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), 4) + 0 AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
            round(dsumRaw(col("l_quantity")) / count(lit(1)), 2).as("avg_qty"),
            round(dsumRaw(col("l_extendedprice")) / count(lit(1)), 2).as("avg_price"),
            round(dsumRaw(col("l_discount")) / count(lit(1)), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    QueryDef(
      "q02_agg_rollup",
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    QueryDef(
      "q03_agg_cube",
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS sum_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))),

    QueryDef(
      "q04_grouping_sets",
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      }),

    QueryDef(
      "q05_count_distinct",
      Some("""SELECT l_returnflag,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_partkey")).as("n_parts"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))),

    QueryDef(
      "q06_conditional_agg",
      Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        ROUND(CAST(SUM(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS open_value
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_finished"),
            sum(when(col("o_totalprice") > 100000, 1).otherwise(0)).cast("long").as("n_big"),
            dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0)).as("open_value"))
          .orderBy(col("o_orderpriority"))),

    // HyperLogLog++ sketch. At 100 TB this replaces exact COUNT(DISTINCT)
    // whenever a ±2% answer is acceptable: single pass, no per-key
    // shuffle, fixed-size sketch merge. The estimate itself isn't
    // DuckDB-replayable, but it IS deterministic (HLL registers combine
    // by max — partition-order independent), so the query emits the exact
    // counts plus within-relative-error flags and the oracle states the
    // flags must be true: the error bound becomes a hash-exact check.
    QueryDef(
      "q07_approx_distinct",
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_orderkey) AS exact_orders,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          true AS orders_within_5pct,
          true AS parts_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("exact_orders"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("a_o"),
            approx_count_distinct(col("l_partkey"), 0.02).as("a_p"))
          .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
            (abs(col("a_o") - col("exact_orders")) <=
              col("exact_orders") * 0.05).as("orders_within_5pct"),
            (abs(col("a_p") - col("exact_parts")) <=
              col("exact_parts") * 0.05).as("parts_within_5pct"))
          .orderBy(col("l_returnflag"))),

    QueryDef(
      "q08_stats_agg",
      Some("""SELECT l_returnflag,
        ROUND(MIN(l_extendedprice), 2) + 0 AS min_price,
        ROUND(MAX(l_extendedprice), 2) + 0 AS max_price,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*), 2) + 0 AS avg_price,
        COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            round(min(col("l_extendedprice")), 2).as("min_price"),
            round(max(col("l_extendedprice")), 2).as("max_price"),
            round(dsumRaw(col("l_extendedprice")) / count(lit(1)), 2).as("avg_price"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))),

    // Pivot: long → wide on a low-cardinality key. Spark's pivot plans as
    // one hash aggregation with conditional partials (no per-column passes);
    // the oracle states the same thing as explicit FILTERed aggregates.
    QueryDef(
      "q09_pivot",
      Some("""SELECT n_name,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 2) + 0 AS p1_urgent,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (WHERE o_orderpriority = '2-HIGH') AS DOUBLE), 2) + 0 AS p2_high,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS DOUBLE), 2) + 0 AS p3_medium
        FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
          .agg(dsum(col("o_totalprice")))
          .withColumnRenamed("1-URGENT", "p1_urgent")
          .withColumnRenamed("2-HIGH", "p2_high")
          .withColumnRenamed("3-MEDIUM", "p3_medium")
          .orderBy(col("n_name"))),

    // Ordered string aggregation: collect_list is unordered by contract, so
    // sort the array before joining — deterministic on any partitioning
    // (matches the oracle's ORDER BY inside string_agg).
    QueryDef(
      "q0a_string_agg",
      Some("""SELECT c_mktsegment,
        string_agg(DISTINCT c_nationkey::VARCHAR, ',' ORDER BY c_nationkey::VARCHAR) AS nations
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy(col("c_mktsegment"))
          .agg(array_join(array_sort(collect_set(col("c_nationkey").cast("string"))), ",")
            .as("nations"))
          .orderBy(col("c_mktsegment"))),

    // Exact percentiles (continuous interpolation — Spark `percentile` and
    // DuckDB `quantile_cont` share the definition). At 100 TB the approx
    // variant (q07's HLL cousin `percentile_approx`) replaces this; exact
    // percentile is the correctness anchor.
    QueryDef(
      "q0b_percentiles",
      Some("""SELECT o_orderpriority,
        ROUND(quantile_cont(o_totalprice, 0.5), 2) + 0 AS p50,
        ROUND(quantile_cont(o_totalprice, 0.9), 2) + 0 AS p90,
        ROUND(quantile_cont(o_totalprice, 0.99), 2) + 0 AS p99
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"))
          .orderBy(col("o_orderpriority"))),

    // Approximate percentiles — the SKETCH path q0b's exact operator
    // cannot take at 100 TB: exact percentile buffers every value per
    // group; approx_percentile (Greenwald-Khanna) keeps a bounded sketch
    // whose partial buffers merge map-side, so the shuffle carries one
    // sketch per group per partition regardless of row count. Error-bound
    // oracle (the q07 HLL pattern): the sketch value must land inside the
    // exact ±0.02-RANK band around each target quantile — at accuracy
    // 10000 the guaranteed rank error is n/10000 (≤ 0.0001 of rank at any
    // test SF), so the band holds with 200x margin; the oracle emits the
    // same `true` flags plus the exact p50 anchor.
    QueryDef(
      "q0c_approx_percentiles",
      Some("""SELECT o_orderpriority,
        ROUND(quantile_cont(o_totalprice, 0.5), 2) + 0 AS p50_exact,
        true AS p50_in_band, true AS p90_in_band, true AS p99_in_band
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50_exact"),
            expr("approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)")
              .as("ap"),
            expr("percentile(o_totalprice, array(0.48D, 0.52D, 0.88D, 0.92D, 0.97D, 1.0D))")
              .as("bands"))
          .select(col("o_orderpriority"), col("p50_exact"),
            (col("ap")(0) >= col("bands")(0) && col("ap")(0) <= col("bands")(1))
              .as("p50_in_band"),
            (col("ap")(1) >= col("bands")(2) && col("ap")(1) <= col("bands")(3))
              .as("p90_in_band"),
            (col("ap")(2) >= col("bands")(4) && col("ap")(2) <= col("bands")(5))
              .as("p99_in_band"))
          .orderBy(col("o_orderpriority"))),

    // Count-Min-Sketch frequency estimation — the sketch Spark builds
    // distributed (`count_min_sketch`: TypedImperativeAggregate, one
    // serialized sketch per partition crosses the exchange) but only
    // reads back driver-side; [[graft.functions.CmsFunctions]] keeps the
    // probe in-plan (sketch as scalar subquery, the q6g Bloom pattern).
    // Error-bound oracle (the q07 rule): for the 20 most frequent
    // tokens, the estimate can NEVER undercount (a structural CMS
    // guarantee) and must stay within 3·eps·N above the exact count —
    // deterministic with the fixed seed, so the flags are stable, and
    // the exact counts anchor the compare. At 100 TB this is the
    // frequency operator: the exact per-token groupBy here is the test
    // oracle, the sketch is what ships.
    QueryDef(
      "q0d_cms_token_freq",
      Some("""WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        c AS (SELECT token, count(*) AS exact_count FROM tok GROUP BY token),
        r AS (SELECT token, exact_count,
                row_number() OVER (ORDER BY exact_count DESC, token) AS rn
              FROM c)
        SELECT token, CAST(exact_count AS BIGINT) AS exact_count,
          true AS no_undercount, true AS within_eps
        FROM r WHERE rn <= 20 ORDER BY exact_count DESC, token"""),
      (s, dir) => {
        import graft.functions.CmsFunctions
        val tok = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
        val sketch = tok
          .agg(expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("cms"))
          .scalar()
        val grouped = tok.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
        // N (total tokens) rides in-plan as a scalar subquery — the same
        // idiom that carries the sketch — so no row of the grouped
        // vocabulary ever needs a global window. Top-20 via orderBy+limit
        // plans TakeOrderedAndProject: per-partition top-k, then a driver
        // merge of k·partitions rows. At a 100 TB corpus the distinct
        // vocabulary is 10^8–10^9 rows; an empty-partitioning Window here
        // would funnel all of them through one task.
        // total = corpus token count, NOT sum over the grouped vocabulary:
        // as a scalar subquery the latter would re-run the full groupBy
        // (second vocabulary shuffle); count() is one scan of map-side
        // partial counts merged into a single row
        val total = tok.agg(count(lit(1)).as("n")).scalar()
        // ONE projection above the limit (cms_estimate inlined per flag —
        // 2 probes × 20 rows): a two-level projection can't collapse
        // (duplicating the probe) and a stacked Project breaks the
        // Limit(Project(Sort)) pattern, degrading TakeOrderedAndProject
        // back to a full global range-sort of the vocabulary
        def est = CmsFunctions.cms_estimate(sketch, col("token"))
        grouped
          .orderBy(col("exact_count").desc, col("token"))
          .limit(20)
          .select(col("token"), col("exact_count"),
            (est >= col("exact_count")).as("no_undercount"),
            (est <= col("exact_count") +
              ceil(lit(0.003) * total).cast("long")).as("within_eps"))
          .orderBy(col("exact_count").desc, col("token"))
      }),

    // Mergeable HLL sketches AS DATA (DataSketches HllSketch via
    // `hll_sketch_agg`/`hll_union_agg`) — the two-level rollup shape that
    // makes 100 TB distinct-counting cheap: build one fixed-size sketch
    // per (lang, source) partition, then answer the per-lang question by
    // UNIONING the stored sketches — no re-scan of the corpus, no
    // per-key shuffle of raw values. This is the operational difference
    // from q07's approx_count_distinct (which computes one estimate and
    // throws the sketch away): here the sketch is a column you can
    // persist with the partition and fold into any coarser rollup later
    // (per-day → per-month, per-source → corpus). Oracle rule = q07's:
    // HLL register merge is max-based and order-independent, so the
    // estimate is deterministic and the ±5% band (lgConfigK=12 → ~1.6%
    // RSE, band is 3σ) becomes a hash-exact `true` flag; the exact
    // counts anchor the compare.
    QueryDef(
      "q0e_hll_sketch_union",
      Some("""WITH tok AS (
          SELECT lang, source, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        SELECT lang,
          CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_tokens,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS n_parts,
          true AS within_5pct
        FROM tok GROUP BY lang ORDER BY lang"""),
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("lang"), col("source"),
            explode(split(col("text"), " ")).as("tok"))
        val parts = tok.groupBy(col("lang"), col("source"))
          .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"))
        val merged = parts.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_parts"),
            hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
        val exact = tok.groupBy(col("lang"))
          .agg(countDistinct(col("tok")).as("exact_tokens"))
        exact.join(merged, Seq("lang"))
          .select(col("lang"), col("exact_tokens"), col("n_parts"),
            (abs(col("est") - col("exact_tokens")) <=
              col("exact_tokens") * 0.05).as("within_5pct"))
          .orderBy(col("lang"))
      }),

    // Theta-sketch funnel algebra — the set OPERATIONS HLL structurally
    // cannot do: "users who did A and also B" (intersection), "A but
    // never B" (difference), three-stage funnels. Theta sketches (KMV
    // family) keep a bounded sample of hashed keys, so intersection /
    // difference / union compose on the FIXED-SIZE sketches — at 100 TB
    // each audience is one single-pass sketch build (TypedImperative
    // partial per partition crossing the exchange), and every funnel
    // question after that is sketch algebra with zero re-scans; audiences
    // can be persisted per day/segment and intersected across any later
    // question. The exact sides here are the test oracle (the q0d rule:
    // exact groupBy is the oracle, the sketch is what ships). Estimates
    // are deterministic (KMV retention is a pure function of the hash
    // set), and at these cardinalities (≪ k=4096) the sketches are in
    // exact mode, so the ±5% flags pin with zero slack.
    QueryDef(
      "q0f_theta_funnel",
      Some("""WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click' AND value > 150),
        b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 120),
        c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 100)
        SELECT
          CAST((SELECT count(*) FROM a) AS BIGINT) AS exact_a,
          CAST((SELECT count(*) FROM b) AS BIGINT) AS exact_b,
          CAST((SELECT count(*) FROM c) AS BIGINT) AS exact_c,
          CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS exact_ab,
          CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS BIGINT) AS exact_a_not_b,
          CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b
            INTERSECT SELECT * FROM c)) AS BIGINT) AS exact_abc,
          true AS ab_within_5pct, true AS a_not_b_within_5pct, true AS abc_within_5pct
        ORDER BY exact_a"""),
      (s, dir) => {
        val tagged = t(s, dir, "events")
          .select(col("user_id"),
            when(col("event_type") === "click" && col("value") > 150, "a")
              .when(col("event_type") === "purchase" && col("value") > 120, "b")
              .when(col("event_type") === "error" && col("value") > 100, "c")
              .as("tag"))
          .filter(col("tag").isNotNull)
        // sketch side: one bounded sketch per audience, pivoted to a row
        val sk = tagged.groupBy(col("tag"))
          .agg(expr("theta_sketch_agg(user_id)").as("sk"))
          .groupBy().pivot("tag", Seq("a", "b", "c")).agg(first(col("sk")))
          .toDF("a_sk", "b_sk", "c_sk")
        // exact side: per-user tag sets, then one aggregate of membership
        // predicates (set ops as boolean algebra — no INTERSECT re-scans)
        val exact = tagged.groupBy(col("user_id"))
          .agg(collect_set(col("tag")).as("tags"))
          .agg(
            sum(when(array_contains(col("tags"), "a"), 1L).otherwise(0L)).as("exact_a"),
            sum(when(array_contains(col("tags"), "b"), 1L).otherwise(0L)).as("exact_b"),
            sum(when(array_contains(col("tags"), "c"), 1L).otherwise(0L)).as("exact_c"),
            sum(when(array_contains(col("tags"), "a") &&
              array_contains(col("tags"), "b"), 1L).otherwise(0L)).as("exact_ab"),
            sum(when(array_contains(col("tags"), "a") &&
              !array_contains(col("tags"), "b"), 1L).otherwise(0L)).as("exact_a_not_b"),
            sum(when(array_contains(col("tags"), "a") &&
              array_contains(col("tags"), "b") &&
              array_contains(col("tags"), "c"), 1L).otherwise(0L)).as("exact_abc"))
        exact.crossJoin(broadcast(sk))
          .withColumn("est_ab",
            expr("theta_sketch_estimate(theta_intersection(a_sk, b_sk))"))
          .withColumn("est_a_not_b",
            expr("theta_sketch_estimate(theta_difference(a_sk, b_sk))"))
          .withColumn("est_abc", expr(
            "theta_sketch_estimate(theta_intersection(theta_intersection(a_sk, b_sk), c_sk))"))
          .select(col("exact_a"), col("exact_b"), col("exact_c"),
            col("exact_ab"), col("exact_a_not_b"), col("exact_abc"),
            (abs(col("est_ab") - col("exact_ab")) <=
              col("exact_ab") * 0.05).as("ab_within_5pct"),
            (abs(col("est_a_not_b") - col("exact_a_not_b")) <=
              col("exact_a_not_b") * 0.05).as("a_not_b_within_5pct"),
            (abs(col("est_abc") - col("exact_abc")) <=
              col("exact_abc") * 0.05).as("abc_within_5pct"))
          .orderBy(col("exact_a"))
      })
,

    // Column profiling — the data-quality summary every ingest gate runs
    // before a table is admitted to the corpus: per column, row count,
    // null count, exact distinct cardinality, lexicographic min/max (all
    // values profiled AS STRINGS so one flat schema covers every column
    // type). ONE scan computes all 5 columns' stats (Spark plans the
    // multi-distinct agg as a single pass over an Expand — 5× row
    // multiplier, not 5 rescans), and the wide 1-row result unpivots
    // row-locally to the (col_name, stats) long format. At 100 TB the
    // exact COUNT(DISTINCT) per column is the expensive half — the
    // sketch-bounded variant swaps in approx_count_distinct (q07's HLL
    // path) without touching the rest of the shape.
    QueryDef(
      "q9g_column_profile",
      Some("""SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          COUNT(DISTINCT doc_id) AS n_distinct,
          MIN(CAST(doc_id AS VARCHAR)) AS min_str,
          MAX(CAST(doc_id AS VARCHAR)) AS max_str FROM documents
        UNION ALL SELECT 'lang', COUNT(*),
          CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT lang), MIN(CAST(lang AS VARCHAR)),
          MAX(CAST(lang AS VARCHAR)) FROM documents
        UNION ALL SELECT 'n_chars', COUNT(*),
          CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT n_chars), MIN(CAST(n_chars AS VARCHAR)),
          MAX(CAST(n_chars AS VARCHAR)) FROM documents
        UNION ALL SELECT 'source', COUNT(*),
          CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT source), MIN(CAST(source AS VARCHAR)),
          MAX(CAST(source AS VARCHAR)) FROM documents
        UNION ALL SELECT 'text', COUNT(*),
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          COUNT(DISTINCT text), MIN(CAST(text AS VARCHAR)),
          MAX(CAST(text AS VARCHAR)) FROM documents
        ORDER BY col_name"""),
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
        val aggs = cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
            count_distinct(col(c)).as(s"${c}_distinct"),
            min(col(c).cast("string")).as(s"${c}_min"),
            max(col(c).cast("string")).as(s"${c}_max"))
        }
        d.agg(count(lit(1)).as("n_rows"), aggs: _*)
          .select(col("n_rows"), explode(array(cols.map(c =>
            struct(lit(c).as("col_name"),
              col(s"${c}_nulls").as("n_nulls"),
              col(s"${c}_distinct").as("n_distinct"),
              col(s"${c}_min").as("min_str"),
              col(s"${c}_max").as("max_str"))): _*)).as("p"))
          .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
            col("p.n_distinct"), col("p.min_str"), col("p.max_str"))
          .orderBy(col("col_name"))
      }),

    // Equi-depth-histogram selectivity estimation — qad's scan-side twin
    // and the other half of the CBO-stats family: before a 100 TB scan
    // runs, the planner prices `x <= c` from a histogram, and this
    // operator both BUILDS the histogram the way ANALYZE does (bucket
    // boundaries from a bounded 2048-row deterministic sample — the qae
    // splitter machinery on l_extendedprice — then one full pass for
    // exact per-bucket counts and observed min/max) and EVALS the
    // estimate it yields: est(c) = Σ counts below c's bucket + the
    // c-bucket's count × the clamped uniform-interpolation fraction
    // (c − min_b)/(max_b − min_b), against the exact count, as err_ppm.
    // All frames past the two corpus passes are ≤16 rows and meet only
    // broadcast/triangular joins; the exact side is ONE conditional-agg
    // pass unpivoted row-locally. Floats follow the round-9 guard at
    // every division so both engines interpolate identical doubles.
    QueryDef(
      "qaf_histogram_selectivity",
      Some(histOracleSql("TRUE")),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        priceHistEval(s, priceHistBuckets(li, priceHistBounds(li)), li)
      }),

    // Frozen-boundary histogram maintenance — the qaj catalog lifecycle
    // applied to qaf's histogram, completing the stats trio (estimate /
    // maintain counts / maintain distributions): the catalog persists
    // BOUNDARIES and per-bucket stats, an ingest batch counts itself
    // into the FROZEN boundaries and folds in per bucket (counts add,
    // observed min/max widen, bounds carry) — the snapshot is never
    // re-scanned, and the boundaries are never resampled between
    // compactions (the qaa frozen-cap contract: a boundary refresh
    // needs the raw corpus, i.e. the next full ANALYZE). Serve = the
    // qaf selectivity eval through the merged generation. The oracle
    // computes the frozen-boundary histogram over the FULL corpus
    // directly (boundaries from the snapshot's own sample), so
    // merged ≡ full-count-under-frozen-boundaries, bit-exact — the
    // merge arithmetic itself is engine-side only and has no oracle
    // analogue to lean on, exactly like qa8's index merge.
    QueryDef(
      "qak_histogram_maintenance",
      Some(histOracleSql("(l_orderkey % 4) >= 1")),
      (s, dir) => {
        val bp = QueryDef.materializePath(dir, "qak_hist_bounds.parquet")
        val v0p = QueryDef.materializePath(dir, "qak_hist_v0.parquet")
        val v1p = QueryDef.materializePath(dir, "qak_hist_v1.parquet")
        val li = t(s, dir, "lineitem")
        val snap = li.filter(pmod(col("l_orderkey"), lit(4L)) >= 1)
        val batch = li.filter(pmod(col("l_orderkey"), lit(4L)) === 0)
        // catalog generation 0: boundaries from the snapshot's own
        // bounded sample, then the snapshot's bucket stats against them
        priceHistBounds(snap).write.mode("overwrite").parquet(bp)
        priceHistBuckets(snap, s.read.parquet(bp))
          .write.mode("overwrite").parquet(v0p)
        // the ingest batch counts itself into the FROZEN boundaries and
        // folds in per bucket; Spark's least/greatest skip nulls, which
        // is exactly the one-sided-bucket semantics the full-outer needs
        val bb = priceHistBuckets(batch, s.read.parquet(bp))
          .select(col("pid"), col("cnt").as("cnt_b"),
            col("mnb").as("mnb_b"), col("mxb").as("mxb_b"),
            col("lo_s").as("lo_b"), col("hi_s").as("hi_b"))
        s.read.parquet(v0p)
          .select(col("pid"), col("cnt").as("cnt_a"),
            col("mnb").as("mnb_a"), col("mxb").as("mxb_a"),
            col("lo_s").as("lo_a"), col("hi_s").as("hi_a"))
          .join(bb, Seq("pid"), "full_outer")
          .select(col("pid"),
            (coalesce(col("cnt_a"), lit(0L))
              + coalesce(col("cnt_b"), lit(0L))).as("cnt"),
            least(col("mnb_a"), col("mnb_b")).as("mnb"),
            greatest(col("mxb_a"), col("mxb_b")).as("mxb"),
            coalesce(col("lo_a"), col("lo_b")).as("lo_s"),
            coalesce(col("hi_a"), col("hi_b")).as("hi_s"))
          .write.mode("overwrite").parquet(v1p)
        // serve the selectivity eval through the merged generation
        priceHistEval(s, s.read.parquet(v1p), li)
      })
  )

  /** qaf/qak shared oracle: the frozen-boundary histogram eval —
    * boundaries from the bounded sample of rows matching `samplePred`
    * (TRUE = the whole corpus, qaf; a snapshot predicate = qak's
    * rebuild measure), bucket counts and the exact side always over the
    * FULL corpus. */
  /** The histogram-build CTE chain (tot/sp/samp/spl/asg/bk) shared by
    * qaf/qak's eval oracle and qd3's selectivity-composed DP oracle —
    * one spec text for "what the equi-depth histogram over
    * l_extendedprice IS". */
  private[queries] def histBucketCtesSql(samplePred: String): String =
    s"""tot AS (SELECT COUNT(*) AS nn FROM lineitem
          WHERE $samplePred),
        sp AS (SELECT GREATEST(1, nn // 2048) AS sdiv FROM tot),
        samp AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                 FROM lineitem, sp
                 WHERE $samplePred
                   AND ((((l_orderkey * 8 + l_linenumber) % 1000003)
                   * 2654435761) % sdiv) = 0),
        spl AS (SELECT list_transform(quantile_cont(x,
                  [0.0625, 0.125, 0.1875, 0.25, 0.3125, 0.375, 0.4375,
                   0.5, 0.5625, 0.625, 0.6875, 0.75, 0.8125, 0.875,
                   0.9375]), s -> round(s, 9)) AS qs FROM samp),
        asg AS (SELECT CAST(list_sum(list_transform(qs, s ->
                  CASE WHEN CAST(l_extendedprice AS DOUBLE) > s
                    THEN 1 ELSE 0 END)) AS INT) AS pid,
                  CAST(l_extendedprice AS DOUBLE) AS x, qs
                FROM lineitem, spl),
        bk AS (SELECT pid, COUNT(*) AS cnt, MIN(x) AS mnb, MAX(x) AS mxb,
                 MIN(CASE WHEN pid >= 1 THEN qs[pid] END) AS lo_s,
                 MIN(CASE WHEN pid <= 14 THEN qs[pid + 1] END) AS hi_s
               FROM asg GROUP BY pid)"""

  /** The histogram estimate of `x <= c` as oracle SQL, over the `bk`
    * CTE — buckets strictly below contribute full counts, c's bucket a
    * clamped round-9 interpolation (the exact double algebra
    * [[priceHistEstimate]] computes engine-side). */
  private[queries] def histEstCteSql(name: String, c: String): String =
    s"""$name AS (SELECT ROUND(
            COALESCE(SUM(CASE WHEN bk.hi_s IS NOT NULL
                AND $c > bk.hi_s
              THEN CAST(bk.cnt AS DOUBLE) END), 0)
          + COALESCE(SUM(CASE WHEN (bk.lo_s IS NULL OR $c > bk.lo_s)
                AND (bk.hi_s IS NULL OR $c <= bk.hi_s)
              THEN bk.cnt * COALESCE(LEAST(CAST(1.0 AS DOUBLE),
                  GREATEST(CAST(0.0 AS DOUBLE),
                    ROUND(($c - bk.mnb)
                      / NULLIF(bk.mxb - bk.mnb, 0), 9))),
                CASE WHEN $c >= bk.mnb THEN CAST(1.0 AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END,
                CAST(0.0 AS DOUBLE)) END), 0), 4) AS est_rows
        FROM bk)"""

  private def histOracleSql(samplePred: String): String =
    s"""WITH ${histBucketCtesSql(samplePred)},
        cs AS (SELECT CAST(c AS DOUBLE) AS c FROM (VALUES (2000.0),
                 (10000.0), (25000.0), (50000.0), (90000.0)) v(c)),
        est AS (SELECT cs.c, ROUND(
                  COALESCE(SUM(CASE WHEN bk.hi_s IS NOT NULL
                      AND cs.c > bk.hi_s
                    THEN CAST(bk.cnt AS DOUBLE) END), 0)
                + COALESCE(SUM(CASE WHEN (bk.lo_s IS NULL OR cs.c > bk.lo_s)
                      AND (bk.hi_s IS NULL OR cs.c <= bk.hi_s)
                    THEN bk.cnt * COALESCE(LEAST(CAST(1.0 AS DOUBLE),
                        GREATEST(CAST(0.0 AS DOUBLE),
                          ROUND((cs.c - bk.mnb)
                            / NULLIF(bk.mxb - bk.mnb, 0), 9))),
                      CASE WHEN cs.c >= bk.mnb THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END,
                      CAST(0.0 AS DOUBLE)) END), 0), 4) + 0 AS est_rows
                FROM cs LEFT JOIN bk
                  ON (bk.hi_s IS NOT NULL AND cs.c > bk.hi_s)
                  OR ((bk.lo_s IS NULL OR cs.c > bk.lo_s)
                    AND (bk.hi_s IS NULL OR cs.c <= bk.hi_s))
                GROUP BY cs.c),
        exw AS (SELECT
          SUM(CASE WHEN l_extendedprice <= 2000.0 THEN 1 ELSE 0 END) AS e1,
          SUM(CASE WHEN l_extendedprice <= 10000.0 THEN 1 ELSE 0 END) AS e2,
          SUM(CASE WHEN l_extendedprice <= 25000.0 THEN 1 ELSE 0 END) AS e3,
          SUM(CASE WHEN l_extendedprice <= 50000.0 THEN 1 ELSE 0 END) AS e4,
          SUM(CASE WHEN l_extendedprice <= 90000.0 THEN 1 ELSE 0 END) AS e5
          FROM lineitem),
        ex AS (SELECT CAST(2000.0 AS DOUBLE) AS c, e1 AS x FROM exw
          UNION ALL SELECT 10000.0, e2 FROM exw
          UNION ALL SELECT 25000.0, e3 FROM exw
          UNION ALL SELECT 50000.0, e4 FROM exw
          UNION ALL SELECT 90000.0, e5 FROM exw)
        SELECT est.c AS c, CAST(est.est_rows AS DOUBLE) AS est_rows,
          CAST(ex.x AS BIGINT) AS exact_rows,
          COALESCE(CAST(floor(round(ABS(est.est_rows - ex.x) * 1000000.0
            / NULLIF(CAST(ex.x AS DOUBLE), 0), 6) + 0) AS BIGINT), -1)
            AS err_ppm
        FROM est JOIN ex ON ex.c = est.c ORDER BY c"""

  /** qaf/qak shared histogram machinery over l_extendedprice. */

  /** Splitter boundaries (1-row frame, column `qs`: 15 round-9 doubles)
    * from the qae bounded 2048-row deterministic sample of `rows`. */
  private[graft] def priceHistBounds(rows: DataFrame): DataFrame = {
    val tot = rows.agg(count(lit(1)).as("nn"))
    val sdiv = greatest(lit(1L),
      floor(tot.scalar() / lit(2048.0)).cast("long"))
    rows.filter(
        pmod(((col("l_orderkey") * 8 + col("l_linenumber")) % 1000003L)
          * 2654435761L, sdiv) === 0)
      .agg(expr("""percentile(cast(l_extendedprice as double),
          array(0.0625d, 0.125d, 0.1875d, 0.25d, 0.3125d, 0.375d,
            0.4375d, 0.5d, 0.5625d, 0.625d, 0.6875d, 0.75d, 0.8125d,
            0.875d, 0.9375d))""").as("qs0"))
      .select(expr("transform(qs0, s -> round(s, 9))").as("qs"))
  }

  /** One counting pass of `rows` into the boundary frame: per bucket,
    * exact count, observed min/max, and the bucket's own splitter
    * bounds carried THROUGH the pass (constant per pid, so min() in the
    * agg) — downstream consumers join the 16-row frame alone and the
    * boundary subtree is planned exactly once. */
  private[graft] def priceHistBuckets(rows: DataFrame,
      bounds: DataFrame): DataFrame =
    rows.crossJoin(broadcast(bounds))
      .select(col("l_extendedprice").cast("double").as("x"),
        col("qs"), expr(
        """cast(aggregate(qs, 0, (a, s) ->
             a + IF(cast(l_extendedprice as double) > s, 1, 0))
           as int)""").as("pid"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"),
        min(col("x")).as("mnb"), max(col("x")).as("mxb"),
        min(expr("IF(pid >= 1, element_at(qs, pid), null)")).as("lo_s"),
        min(expr("IF(pid <= 14, element_at(qs, pid + 1), null)"))
          .as("hi_s"))

  /** Histogram estimate of `x <= c` per constant in `consts` (column
    * `c`, double): buckets strictly below c contribute full counts, c's
    * own bucket a clamped round-9 interpolation fraction — ONE OR-join
    * with disjoint conditional sums. Shared by qaf/qak's eval and
    * qd3's single-constant planner scalar. */
  private def histEstFor(consts: DataFrame, buckets: DataFrame): DataFrame = {
    val belowCond = col("hi_s").isNotNull && col("c") > col("hi_s")
    val ownCond = (col("lo_s").isNull || col("c") > col("lo_s")) &&
      (col("hi_s").isNull || col("c") <= col("hi_s"))
    consts
      .join(broadcast(buckets), belowCond || ownCond, "left")
      .groupBy(col("c"))
      .agg(round(
        coalesce(sum(when(belowCond, col("cnt").cast("double"))),
          lit(0.0))
        + coalesce(sum(when(ownCond, col("cnt") * expr("""coalesce(
            least(1.0d, greatest(0.0d,
              round((c - mnb) / nullif(mxb - mnb, 0), 9))),
            IF(c >= mnb, 1.0d, 0.0d), 0.0d)"""))), lit(0.0)), 4)
        .as("est_rows"))
  }

  /** The qd3 planner scalar: the histogram estimate of
    * `l_extendedprice <= c` as a 1-row (est_rows double) frame. */
  private[graft] def priceHistEstimate(s: SparkSession,
      buckets: DataFrame, c: Double): DataFrame =
    histEstFor(s.range(1).select(lit(c).as("c")), buckets)

  /** The selectivity eval: estimate `x <= c` for the 5 constants from
    * the bucket frame via [[histEstFor]], compare against the exact
    * counts over `corpus` (one conditional-agg pass, unpivoted
    * row-locally). */
  private[graft] def priceHistEval(s: SparkSession, buckets: DataFrame,
      corpus: DataFrame): DataFrame = {
    val consts = s.range(1).select(explode(array(
      lit(2000.0), lit(10000.0), lit(25000.0), lit(50000.0),
      lit(90000.0))).as("c"))
    val est = histEstFor(consts, buckets)
    val exact = corpus.agg(
        sum(when(col("l_extendedprice") <= 2000.0, 1L).otherwise(0L)).as("e1"),
        sum(when(col("l_extendedprice") <= 10000.0, 1L).otherwise(0L)).as("e2"),
        sum(when(col("l_extendedprice") <= 25000.0, 1L).otherwise(0L)).as("e3"),
        sum(when(col("l_extendedprice") <= 50000.0, 1L).otherwise(0L)).as("e4"),
        sum(when(col("l_extendedprice") <= 90000.0, 1L).otherwise(0L)).as("e5"))
      .select(explode(array(
        struct(lit(2000.0).as("c"), col("e1").as("x")),
        struct(lit(10000.0).as("c"), col("e2").as("x")),
        struct(lit(25000.0).as("c"), col("e3").as("x")),
        struct(lit(50000.0).as("c"), col("e4").as("x")),
        struct(lit(90000.0).as("c"), col("e5").as("x")))).as("p"))
      .select(col("p.c").as("c"), col("p.x").as("x"))
    est.join(broadcast(exact), Seq("c"))
      .select(col("c"), col("est_rows"),
        col("x").cast("long").as("exact_rows"),
        expr("""coalesce(cast(floor(round(abs(est_rows - x) * 1000000.0d
            / nullif(cast(x as double), 0), 6)) as bigint), -1L)""")
          .as("err_ppm"))
      .orderBy(col("c"))
  }
}

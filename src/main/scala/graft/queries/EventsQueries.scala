package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Event-table queries: JSON payload decode (reference format surface F-x,
  * SURVEY.md §2.2 — `events.props` is the wire-payload stand-in), plus the
  * batch equivalents of the streaming semantics in §2.10 (sessionization,
  * tumbling windows). The streaming variants run in
  * [[graft.streaming.StreamPipelines]]; these batch twins are what the
  * DuckDB oracle can check.
  */
object EventsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    // Payload decode: Spark-side uses from_json (codegen'd JSON path);
    // oracle extracts the same value with a regex so it needs no DuckDB
    // JSON extension.
    QueryDef(
      "q34_json_decode",
      Some("""SELECT event_id,
        CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INT) AS k
        FROM events ORDER BY event_id"""),
      (s, dir) =>
        t(s, dir, "events").select(
          col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
          .orderBy(col("event_id"))),

    // Sessionization (30-min inactivity gap) — batch twin of the streaming
    // session_window aggregation. One shuffle on user_id; the gap test is a
    // lag() over (user_id, ts) — scales with events per user, not total n.
    QueryDef(
      "q40_sessionize",
      Some("""WITH g AS (
        SELECT user_id, event_id,
          CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                 OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_sess
        FROM events)
        SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM g GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ns").isNull ||
              col("ts_ns") - col("prev_ns") > 1800L * 1000000000L, 1)
              .otherwise(0))
          .groupBy(col("user_id"))
          .agg(sum(col("new_sess")).cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      }),

    // Tumbling 1-hour windows by event type — batch twin of the streaming
    // windowed aggregation. Day/hour extracted as ints so ns-vs-µs timestamp
    // precision can't leak into the compare.
    QueryDef(
      "q41_event_windows",
      Some("""SELECT CAST(EXTRACT(day FROM ts) AS INT) AS d,
        CAST(EXTRACT(hour FROM ts) AS INT) AS h,
        event_type, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS total_value
        FROM events GROUP BY 1, 2, 3 ORDER BY d, h, event_type"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            dayofmonth(col("ts")).as("d"),
            hour(col("ts")).as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            Aggregates.dsum(col("value")).as("total_value"))
          .orderBy(col("d"), col("h"), col("event_type"))),

    // Retention cohort analysis — the classic product-analytics rollup:
    // users cohorted by first-activity day, then counted active at each
    // day offset from their cohort. Two shuffles on user_id (the min-day
    // cohort agg and the distinct active-days set), a broadcast-sized
    // join of user→cohort onto activity, and one final narrow agg — the
    // shape that stays linear when events are 100 TB: per-user state is
    // one date, the join key is the user id, and nothing ever sorts
    // globally. All-integer → hash-exact. (The events fixture spans one
    // calendar month, so day-of-month arithmetic is offset-safe.)
    QueryDef(
      "q42_retention_cohort",
      Some("""WITH first AS (
          SELECT user_id, MIN(CAST(EXTRACT(day FROM ts) AS INT)) AS cohort_day
          FROM events GROUP BY user_id),
        act AS (SELECT DISTINCT user_id, CAST(EXTRACT(day FROM ts) AS INT) AS d
          FROM events)
        SELECT f.cohort_day, a.d - f.cohort_day AS day_offset,
          COUNT(*) AS n_active
        FROM act a JOIN first f ON f.user_id = a.user_id
        GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val first = ev.groupBy(col("user_id"))
          .agg(min(dayofmonth(col("ts"))).as("cohort_day"))
        val act = ev.select(col("user_id"), dayofmonth(col("ts")).as("d"))
          .distinct()
        act.join(first, Seq("user_id"))
          .groupBy(col("cohort_day"),
            (col("d") - col("cohort_day")).as("day_offset"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy(col("cohort_day"), col("day_offset"))
      }),

    // ORDERED funnel progression with conversion windows: view → click
    // within 48h → purchase within 48h of the click, each stage's anchor
    // being the user's EARLIEST qualifying event strictly after the
    // previous anchor (the earliest-anchor greedy is the standard funnel
    // semantics and is order-deterministic, unlike "any qualifying
    // triple"; the window is what makes the funnel discriminate — an
    // unwindowed variant saturates on any active user). Three per-user
    // min aggregations, each a user_id-keyed shuffle of (user_id, ns)
    // pairs — no event ever joins event-to-event, so a hot user costs
    // its event count, not its event count squared. Strict-ns
    // comparisons (ts_ns ≡ oracle epoch_ns) make stage membership exact.
    QueryDef(
      "q43_funnel_sequence",
      Some("""WITH v AS (
          SELECT user_id, MIN(epoch_ns(ts)) AS tv
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(epoch_ns(e.ts)) AS tc
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.tv
            AND epoch_ns(e.ts) <= v.tv + 172800000000000
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(epoch_ns(e.ts)) AS tp
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.tc
            AND epoch_ns(e.ts) <= c.tc + 172800000000000
          GROUP BY e.user_id)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL SELECT '2_click', COUNT(*) FROM c
          UNION ALL SELECT '3_purchase', COUNT(*) FROM p) s
        ORDER BY stage"""),
      (s, dir) => {
        val winNs = 172800000000000L // 48h, the oracle's literal
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts_ns"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("tv"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts_ns") > col("tv") && col("ts_ns") <= col("tv") + winNs)
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("tc"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts_ns") > col("tc") && col("ts_ns") <= col("tc") + winNs)
          .groupBy(col("user_id")).agg(min(col("ts_ns")).as("tp"))
        v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), col("n_users"))
          .unionAll(c.agg(count(lit(1)).as("n_users"))
            .select(lit("2_click").as("stage"), col("n_users")))
          .unionAll(p.agg(count(lit(1)).as("n_users"))
            .select(lit("3_purchase").as("stage"), col("n_users")))
          .orderBy(col("stage"))
      }),

    // Behavioral transition matrix (first-order Markov counts): for each
    // user's event stream in time order, count (previous event type →
    // this event type) transitions corpus-wide. One per-user window
    // (PARTITIONED by user_id, ordered by exact ns + event_id — never a
    // global sort) followed by a narrow (from, to, count) aggregation —
    // the per-user window scales with events per user, the agg output is
    // |types|², both flat in total corpus size. The event-id tiebreak
    // makes simultaneous events deterministic on both engines.
    QueryDef(
      "q44_markov_transitions",
      Some("""WITH seq AS (
          SELECT user_id, event_type,
            LAG(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts), event_id) AS prev_type
          FROM events)
        SELECT prev_type AS from_type, event_type AS to_type,
          COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY from_type, to_type"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns"), col("event_id"))
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type").as("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      })
,

    // Robust outlier detection — per-event-type median/MAD z-scores, the
    // metric-monitoring primitive ("which readings are wild for THIS
    // signal") that mean/stddev can't provide under heavy tails: one
    // genuine outlier inflates the stddev enough to hide the rest, while
    // median and MAD have a 50% breakdown point. Flag |value − med| >
    // 3·1.4826·MAD (1.4826 = 1/Φ⁻¹(3/4) makes MAD a consistent σ
    // estimate under normality). Shape: two per-type aggregations whose
    // outputs are |event_type|-row frames broadcast back onto the events
    // scan, then a row-local flag — events themselves shuffle only for
    // the exact per-type percentile. Exact interpolated medians keep the
    // oracle bit-identical (both engines: sort, index p·(n−1), linear
    // interpolation), quantized to 9; at 100 TB per-type value sets the
    // exact sort is the cost, and the state-bounded variant is the q0c
    // GK-sketch path with a tolerance band instead of a hash match.
    QueryDef(
      "q9i_event_anomaly",
      Some("""WITH med AS (SELECT event_type,
               round(quantile_cont(value, 0.5), 9) + 0 AS med
              FROM events GROUP BY event_type),
        mad AS (SELECT e.event_type,
               round(quantile_cont(abs(e.value - m.med), 0.5), 9) + 0 AS mad
              FROM events e JOIN med m USING (event_type)
              GROUP BY e.event_type)
        SELECT e.event_id, e.event_type,
          round((e.value - m.med) / (CAST(1.4826 AS DOUBLE) * d.mad), 6) + 0 AS z
        FROM events e JOIN med m USING (event_type)
                      JOIN mad d USING (event_type)
        WHERE d.mad > 0 AND abs(e.value - m.med)
          > CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * d.mad
        ORDER BY event_id"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(round(percentile(col("value"), lit(0.5)), 9).as("med"))
        val withMed = ev.join(broadcast(med), Seq("event_type"))
        val mad = withMed.groupBy(col("event_type"))
          .agg(round(percentile(abs(col("value") - col("med")), lit(0.5)), 9)
            .as("mad"))
        withMed.join(broadcast(mad), Seq("event_type"))
          .filter(col("mad") > 0 &&
            abs(col("value") - col("med")) > lit(3) * lit(1.4826) * col("mad"))
          .select(col("event_id"), col("event_type"),
            round((col("value") - col("med"))
              / (lit(1.4826) * col("mad")), 6).as("z"))
          .orderBy(col("event_id"))
      })
,

    // Exponentially-decayed engagement — recency-weighted activity per
    // event type (half-life-style decay, τ = 1 day): each event counts
    // exp(−Δt/τ) where Δt is its age at the corpus horizon (max ts, an
    // in-plan scalar subquery — no driver collect). This is the
    // freshness statistic ranking/monitoring pipelines keep per key —
    // "how active is this signal NOW" — which a plain count can't
    // express and a time-window cutoff expresses only as a cliff.
    // Shape: the decay weight is row-local arithmetic on the scan, then
    // ONE map-side-combined narrow agg per type. Determinism: the age
    // ratio is exact-long subtraction / double division (identical on
    // both engines), exp() quantized to 9 (libm-vs-JVM last-ulp), terms
    // summed as exact DECIMAL, final round(·, 6).
    QueryDef(
      "q9m_decayed_engagement",
      Some("""WITH mx AS (SELECT MAX(epoch_ns(ts)) AS m FROM events),
        w AS (SELECT event_type,
               round(exp(-(((SELECT m FROM mx) - epoch_ns(ts))
                 / CAST(86400000000000 AS DOUBLE))), 9) + 0 AS dw
              FROM events)
        SELECT event_type, COUNT(*) AS n,
          round(CAST(SUM(CAST(dw AS DECIMAL(30,12))) AS DOUBLE), 6) + 0
            AS decayed_n,
          round(round(CAST(SUM(CAST(dw AS DECIMAL(30,12))) AS DOUBLE), 6)
            / COUNT(*), 6) + 0 AS freshness
        FROM w GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("event_type"), col("ts_ns"))
        val mx = ev.agg(max(col("ts_ns")).as("m")).scalar()
        ev.select(col("event_type"),
            round(exp(-((mx - col("ts_ns"))
              / lit(86400000000000L).cast("double"))), 9).as("dw"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("dw").cast("decimal(30,12)")).cast("double"), 6)
              .as("decayed_n"))
          .select(col("event_type"), col("n"), col("decayed_n"),
            round(col("decayed_n") / col("n"), 6).as("freshness"))
          .orderBy(col("event_type"))
      })
,

    // Key-skew diagnostics — the reconnaissance report behind every
    // salting / AQE-skew-join decision (q19's salted join treats skew;
    // this MEASURES it): per candidate shuffle key, the concentration
    // statistics that predict a hot partition. HHI (Herfindahl index,
    // Σ share²) is the sort-free concentration measure — a plain
    // aggregate over the per-key count frame, where Gini would demand a
    // global rank (exactly the single-task sort this suite bans);
    // max/mean says how much bigger the hottest task is than the
    // average one — the straggler multiplier at 100 TB. Shape: one
    // map-side-combined count per key column, then arithmetic on the
    // key-cardinality frames.
    QueryDef(
      "q9u_key_skew",
      Some("""WITH u AS (SELECT user_id AS k FROM events),
        t AS (SELECT event_type AS k FROM events),
        pu AS (SELECT k, COUNT(*) AS c FROM u GROUP BY k),
        pt AS (SELECT k, COUNT(*) AS c FROM t GROUP BY k),
        su AS (SELECT 'user_id' AS key_col, COUNT(*) AS n_keys,
                 CAST(SUM(c) AS BIGINT) AS n_rows,
                 CAST(MAX(c) AS BIGINT) AS max_rows,
                 round(MAX(c) * COUNT(*) * CAST(1 AS DOUBLE) / SUM(c), 4) + 0
                   AS max_over_mean,
                 round(CAST(SUM(CAST(round(c * CAST(1 AS DOUBLE) / (SELECT SUM(c) FROM pu), 9)
                     * round(c * CAST(1 AS DOUBLE) / (SELECT SUM(c) FROM pu), 9) AS DECIMAL(30,14)))
                   AS DOUBLE), 8) + 0 AS hhi
               FROM pu),
        st AS (SELECT 'event_type' AS key_col, COUNT(*) AS n_keys,
                 CAST(SUM(c) AS BIGINT) AS n_rows,
                 CAST(MAX(c) AS BIGINT) AS max_rows,
                 round(MAX(c) * COUNT(*) * CAST(1 AS DOUBLE) / SUM(c), 4) + 0
                   AS max_over_mean,
                 round(CAST(SUM(CAST(round(c * CAST(1 AS DOUBLE) / (SELECT SUM(c) FROM pt), 9)
                     * round(c * CAST(1 AS DOUBLE) / (SELECT SUM(c) FROM pt), 9) AS DECIMAL(30,14)))
                   AS DOUBLE), 8) + 0 AS hhi
               FROM pt)
        SELECT * FROM su UNION ALL SELECT * FROM st ORDER BY key_col"""),
      (s, dir) => {
        val ev = t(s, dir, "events")
        def profile(keyCol: String): DataFrame = {
          val p = ev.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
          val tot = p.agg(sum(col("c")).as("t")).scalar()
          p.agg(
            count(lit(1)).as("n_keys"),
            sum(col("c")).cast("long").as("n_rows"),
            max(col("c")).cast("long").as("max_rows"),
            round(max(col("c")) * count(lit(1)) * lit(1.0) / sum(col("c")), 4)
              .as("max_over_mean"),
            round(sum((round(col("c") * lit(1.0) / tot, 9)
                * round(col("c") * lit(1.0) / tot, 9))
              .cast("decimal(30,14)")).cast("double"), 8).as("hhi"))
            .select(lit(keyCol).as("key_col"), col("n_keys"), col("n_rows"),
              col("max_rows"), col("max_over_mean"), col("hhi"))
        }
        profile("user_id").unionByName(profile("event_type"))
          .orderBy(col("key_col"))
      })
,

    // Pareto concentration — per event type, how few users carry 80% of
    // the value (the 80/20 report behind capacity planning, abuse
    // triage, and whale-detection): users ranked by their value total,
    // running share accumulated, count those needed to cross 80%. The
    // window partitions BY TYPE (per-key ordering scales with users per
    // type, never a global sort — q44's rule). Determinism: per-user
    // totals and the running sum are exact DECIMAL folds (a double
    // running sum would be reduction-order-dependent); the 80% line is
    // compared in decimal, and ranking ties break by user_id.
    QueryDef(
      "q9w_pareto_users",
      Some("""WITH uv AS (SELECT event_type, user_id,
                CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(30,8)) AS uv
              FROM events GROUP BY event_type, user_id),
        tt AS (SELECT event_type, SUM(uv) AS total, COUNT(*) AS n_users
               FROM uv GROUP BY event_type),
        c AS (SELECT uv.event_type, uv.user_id, uv.uv, tt.total, tt.n_users,
                SUM(uv.uv) OVER (PARTITION BY uv.event_type
                  ORDER BY uv.uv DESC, uv.user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM uv JOIN tt USING (event_type))
        SELECT event_type, CAST(MAX(n_users) AS BIGINT) AS n_users,
          CAST(SUM(CASE WHEN cum - uv < total * CAST(0.8 AS DECIMAL(3,2))
            THEN 1 ELSE 0 END) AS BIGINT) AS n_users_80pct,
          round(SUM(CASE WHEN cum - uv < total * CAST(0.8 AS DECIMAL(3,2))
            THEN 1 ELSE 0 END) * CAST(1 AS DOUBLE) / MAX(n_users), 4) + 0
            AS share_of_users
        FROM c GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        val uv = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("value").cast("decimal(30,8)"))
            .cast("decimal(30,8)").as("uv"))
        val tt = uv.groupBy(col("event_type"))
          .agg(sum(col("uv")).as("total"), count(lit(1)).as("n_users"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("uv").desc, col("user_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        uv.join(broadcast(tt), Seq("event_type"))
          .withColumn("cum", sum(col("uv")).over(w))
          .groupBy(col("event_type"))
          .agg(max(col("n_users")).cast("long").as("n_users"),
            sum(when(col("cum") - col("uv")
              < col("total") * lit(BigDecimal("0.8")), 1L).otherwise(0L))
              .cast("long").as("n_users_80pct"))
          .select(col("event_type"), col("n_users"), col("n_users_80pct"),
            round(col("n_users_80pct") * lit(1.0) / col("n_users"), 4)
              .as("share_of_users"))
          .orderBy(col("event_type"))
      })
,

    // Last-touch attribution — each purchase credits the user's most
    // recent preceding click within a 24 h lookback, else counts as
    // direct: the credit-assignment step q43's funnel (did the sequence
    // happen) and q44's Markov counts (how do types chain) both stop
    // short of. One per-user window ordered by exact event time carries
    // the running last-click (ignoreNulls last over an
    // unbounded-to-previous-row frame — the same-frame trick that makes
    // as-of semantics a window, no self-join, no event×event blowup);
    // the lookback test is then row-local. Scale: partitioned by
    // user_id only (q44's rule), all-integer ns arithmetic.
    QueryDef(
      "q9z_attribution",
      Some("""WITH o AS (SELECT user_id, event_id, event_type,
                epoch_ns(ts) AS tns FROM events),
        wi AS (SELECT user_id, event_id, event_type, tns,
                LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END
                  IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY tns, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_id,
                LAST_VALUE(CASE WHEN event_type = 'click' THEN tns END
                  IGNORE NULLS) OVER (PARTITION BY user_id
                  ORDER BY tns, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c_tns
              FROM o)
        SELECT event_id AS purchase_id,
          CASE WHEN c_id IS NOT NULL
                AND tns - c_tns <= 86400000000000 THEN c_id END
            AS click_id,
          CASE WHEN c_id IS NOT NULL
                AND tns - c_tns <= 86400000000000
            THEN CAST((tns - c_tns) // 60000000000 AS BIGINT) END
            AS gap_minutes
        FROM wi WHERE event_type = 'purchase' ORDER BY purchase_id"""),
      (s, dir) => {
        val o = t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts_ns").as("tns"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tns"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val dayNs = 86400000000000L
        o.withColumn("c_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("c_tns",
            last(when(col("event_type") === "click", col("tns")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            when(col("c_id").isNotNull && col("tns") - col("c_tns") <= dayNs,
              col("c_id")).as("click_id"),
            when(col("c_id").isNotNull && col("tns") - col("c_tns") <= dayNs,
              floor((col("tns") - col("c_tns")) / lit(60000000000L))
                .cast("long")).as("gap_minutes"))
          .orderBy(col("purchase_id"))
      }),

    // Out-of-orderness / watermark-delay profile — the measurement every
    // §2.10 streaming watermark NUMBER should come from: how late does an
    // event arrive relative to the stream's high-water mark, per type,
    // and what delay would a watermark need to not drop data?
    // Arrival is modeled as a deterministic per-event transport jitter
    // ((event_id mod 7)·600 s — a sharded-collector flush model, same
    // replayability discipline as q9h's deterministic Laplace draw);
    // lateness of an event = (running max of event time over ARRIVAL
    // order, inclusive) − its own event time. The global running max is
    // StableIds.runningMax — the two-phase range-partition shape (q1h/
    // q5x), NOT the single-task `MAX() OVER (ORDER BY …)` the oracle is
    // allowed to use single-node. Exact interpolated percentiles keep
    // oracle parity (q9i convention; the GK sketch q0c is the
    // state-bounded swap at 100 TB where per-type value buffers won't
    // fit). rec_delay_ms = ceil(p99 lateness) is the number you'd paste
    // into withWatermark.
    QueryDef(
      "qag_watermark_profile",
      Some("""WITH b AS (SELECT event_id, event_type,
                 epoch_ns(ts) AS tns,
                 epoch_ns(ts) + (event_id % 7) * 600000000000 AS arr
               FROM events),
        w AS (SELECT event_type,
                MAX(tns) OVER (ORDER BY arr, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tns
                  AS late_ns
              FROM b)
        SELECT event_type, COUNT(*) AS n,
          CAST(MAX(late_ns) // 1000000 AS BIGINT) AS max_late_ms,
          ROUND(quantile_cont(CAST(late_ns AS DOUBLE), 0.95) / 1000000.0,
            4) + 0 AS p95_late_ms,
          CAST(SUM(CASE WHEN late_ns > 5000000000 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS late_over_5s_ppm,
          CAST(ceil(round(quantile_cont(CAST(late_ns AS DOUBLE), 0.99)
            / 1000000.0, 9) + 0) AS BIGINT) AS rec_delay_ms
        FROM w GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => {
        val b = t(s, dir, "events").select(
          col("event_id"), col("event_type"), col("ts_ns").as("tns"),
          (col("ts_ns") + (col("event_id") % 7) * 600000000000L).as("arr"))
        graft.operators.StableIds
          .runningMax(b, Seq(col("arr"), col("event_id")), col("tns"), 8,
            outCol = "wm")
          .select(col("event_type"), (col("wm") - col("tns")).as("late_ns"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("max(late_ns) div 1000000").as("max_late_ms"),
            round(expr("percentile(cast(late_ns as double), 0.95d)")
              / 1000000.0, 4).as("p95_late_ms"),
            expr("sum(IF(late_ns > 5000000000, 1, 0)) * 1000000 div count(1)")
              .as("late_over_5s_ppm"),
            expr("""cast(ceil(round(
                percentile(cast(late_ns as double), 0.99d) / 1000000.0d, 9))
              as bigint)""").as("rec_delay_ms"))
          .orderBy(col("event_type"))
      })
  )
}

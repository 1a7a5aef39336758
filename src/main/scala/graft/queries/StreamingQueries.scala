package graft.queries

import graft.streaming.StreamPipelines

/** Oracle-paired entries for the Structured Streaming pipelines
  * (SURVEY.md §2.10). Each runs a REAL incremental streaming execution
  * (file source → watermark → stateful op → memory sink, one-shot
  * AvailableNow trigger); the oracle states the batch-equivalent semantics
  * the stream must converge to after draining its input.
  */
object StreamingQueries {

  val all: Seq[QueryDef] = Seq(

    // Streaming twin of q41_event_windows: watermarked tumbling windows.
    QueryDef(
      "q80_stream_tumbling",
      Some("""SELECT CAST(EXTRACT(day FROM ts) AS INT) AS d,
        CAST(EXTRACT(hour FROM ts) AS INT) AS h,
        event_type, COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 2) AS total_value
        FROM events GROUP BY 1, 2, 3 ORDER BY d, h, event_type"""),
      (s, dir) => StreamPipelines.tumblingWindows(s, dir)),

    // Streaming exact dedup on event_id, then per-type distinct counts.
    QueryDef(
      "q81_stream_dedup",
      Some("""SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => StreamPipelines.streamDedup(s, dir)),

    // Streaming sessionization (session_window, 30-min gap) — same session
    // semantics as the batch lag-based q40_sessionize oracle.
    QueryDef(
      "q82_stream_sessionize",
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
      (s, dir) => StreamPipelines.sessionWindows(s, dir)),

    // Custom per-key streaming state (flatMapGroupsWithState): the drained
    // final state per user equals the batch aggregate.
    QueryDef(
      "q83_stream_stateful",
      Some("""SELECT user_id, COUNT(*) AS n_events,
        ROUND(MAX(value), 2) AS max_value
        FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => StreamPipelines.statefulUserTotals(s, dir)),

    // Stream-static enrichment join (per-micro-batch broadcast dimension).
    QueryDef(
      "q84_stream_static_join",
      Some("""SELECT c_mktsegment, COUNT(*) AS n_events
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, dir) => StreamPipelines.streamStaticJoin(s, dir)),

    // Watermarked stream-stream interval join (state bounded to the
    // 1-hour range) — drained result equals the batch interval join.
    QueryDef(
      "q85_stream_stream_join",
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        ORDER BY purchase_id, click_id"""),
      (s, dir) => StreamPipelines.streamStreamJoin(s, dir)),

    // Sliding 2h/1h windows: the oracle assigns each event to its two
    // overlapping window starts explicitly. Window starts whose span falls
    // entirely before the first event exist on neither side (no rows).
    QueryDef(
      "q86_stream_sliding",
      Some("""WITH w AS (
          SELECT event_type,
            unnest([date_trunc('hour', ts),
                    date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS wstart
          FROM events)
        SELECT CAST(EXTRACT(day FROM wstart) AS INT) AS d,
          CAST(EXTRACT(hour FROM wstart) AS INT) AS h,
          event_type, COUNT(*) AS n
        FROM w GROUP BY 1, 2, 3 ORDER BY d, h, event_type"""),
      (s, dir) => StreamPipelines.slidingWindows(s, dir)),

    // Stream-stream LEFT OUTER interval join: null-padded rows emit only
    // after the watermark proves no match can arrive; both engines bound
    // the purchase side to 4h before corpus end (batch post-filter) (outer flush horizon).
    QueryDef(
      "q88_stream_outer_join",
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events),
        p AS (SELECT user_id AS pu, ts AS pts, event_id AS purchase_id
              FROM events WHERE event_type = 'purchase'
                AND ts < (SELECT m - INTERVAL 4 HOUR FROM mx)),
        c AS (SELECT user_id AS cu, ts AS cts, event_id AS click_id
              FROM events WHERE event_type = 'click')
        SELECT purchase_id, click_id
        FROM p LEFT JOIN c ON pu = cu
          AND cts >= pts - INTERVAL 1 HOUR AND cts <= pts
        ORDER BY purchase_id, click_id NULLS FIRST"""),
      (s, dir) => StreamPipelines.streamStreamOuterJoin(s, dir)),

    // Spark 4 transformWithState (typed ValueState + event-time timers,
    // RocksDB-backed): same per-user totals contract — and the same
    // oracle — as the flatMapGroupsWithState q83, proving the two state
    // APIs agree.
    QueryDef(
      "q89_stream_tws_stateful",
      Some("""SELECT user_id, COUNT(*) AS n_events,
        ROUND(MAX(value), 2) AS max_value
        FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => StreamPipelines.statefulUserTotalsTws(s, dir)),

    // Reference-topology parity pipeline: stream → keyed document sink →
    // read back. The `_id` count proves the key hoist is lossless.
    QueryDef(
      "q87_stream_doc_sink",
      Some("""SELECT event_type, COUNT(*) AS n,
          COUNT(DISTINCT event_id) AS n_ids
        FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => StreamPipelines.streamToDocSink(s, dir))
  )
}

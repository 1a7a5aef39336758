package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental streaming semantics (SURVEY.md §2.10): watermark late-data
  * handling and session merging, driven through MemoryStream batch by batch
  * — behaviors the drained-stream oracle comparisons (q80-q82) can't see.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("watermark finalizes windows and drops late data (append mode)") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    try {
      // two events in the 10:00 window
      in.addData((ts("10:00"), "a"), (ts("10:05"), "a"))
      q.processAllAvailable()
      // nothing final yet: watermark hasn't passed the window end
      assert(spark.table("wm_test").count() == 0)
      // event at 11:00 advances watermark to 10:50 → 10:00 window finalizes
      in.addData((ts("11:00"), "a"))
      q.processAllAvailable()
      val closed = spark.table("wm_test").collect()
      assert(closed.length == 1 && closed.head.getAs[Long]("n") == 2)
      // a late event behind the watermark is dropped, not re-emitted
      in.addData((ts("10:02"), "a"))
      // and one more advance to flush anything it might have produced
      in.addData((ts("12:00"), "a"))
      q.processAllAvailable()
      val after = spark.table("wm_test").collect()
      // still exactly one row for the 10:00 window, count unchanged at 2
      assert(after.count(r => r.getAs[Long]("n") == 2) == 1)
      assert(!after.exists(r => r.getAs[Long]("n") == 3))
    } finally q.stop()
  }

  test("session_window merges events within the gap, splits beyond it") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "u")
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("u"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_test")
      .outputMode("complete").start()
    try {
      // 10:00 + 10:20 chain (20-min gap < 30) → one session;
      // 12:00 is > 30 min after → second session
      in.addData((ts("10:00"), "u1"), (ts("10:20"), "u1"), (ts("12:00"), "u1"))
      q.processAllAvailable()
      val rows = spark.table("sess_test").orderBy(col("session_window.start")).collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2 && rows(1).getAs[Long]("n") == 1)
    } finally q.stop()
  }

  test("flatMapGroupsWithState event-time timeout evicts idle keys") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (String, String)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (k, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.single((k, "EXPIRED"))
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            // expire 20 minutes of event time after the latest update
            state.setTimeoutTimestamp(
              state.getCurrentWatermarkMs() + 20 * 60 * 1000)
            Iterator.single((k, s"n=$n"))
          }
      }.toDF("k", "status")
    val q = out.writeStream.format("memory").queryName("timeout_test")
      .outputMode("append").start()
    try {
      in.addData((ts("10:00"), "u1"))
      q.processAllAvailable()
      // push watermark far past u1's timeout; u1 gets evicted with EXPIRED
      in.addData((ts("12:00"), "u2"))
      q.processAllAvailable()
      in.addData((ts("14:00"), "u2"))
      q.processAllAvailable()
      val st = spark.table("timeout_test").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(st.contains(("u1", "EXPIRED")), s"no eviction event in $st")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses replays inside the horizon") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val dedup = in.toDF().toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("id"))
    val q = dedup.writeStream.format("memory").queryName("ddw_test")
      .outputMode("append").start()
    try {
      in.addData((ts("10:00"), "e1"))
      q.processAllAvailable()
      // replay of e1 within the watermark horizon → suppressed
      in.addData((ts("10:10"), "e1"), (ts("10:15"), "e2"))
      q.processAllAvailable()
      val ids = spark.table("ddw_test").select("id").as[String].collect().sorted
      assert(ids.toSeq == Seq("e1", "e2"))
    } finally q.stop()
  }
}

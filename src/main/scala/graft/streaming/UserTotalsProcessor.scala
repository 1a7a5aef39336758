package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** transformWithState processor (Spark 4 arbitrary-state API): per-user
  * (count, max) accumulator that emits once per key when the event-time
  * watermark passes the key's last activity. Typed ValueState keeps the
  * state row fixed-width; the timer is re-armed to watermark+1 on every
  * batch that touches the key, so exactly one timer per key is live and
  * the flush happens on the first batch after quiescence (for an
  * AvailableNow drain: the final watermark-advancing batch).
  */
class UserTotalsProcessor
    extends StatefulProcessor[Long, (Long, Double, java.sql.Timestamp), (Long, Long, Double)] {

  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Double, java.sql.Timestamp)],
      tv: TimerValues): Iterator[(Long, Long, Double)] = {
    var (n, mx) = if (totals.exists()) totals.get() else (0L, Double.MinValue)
    rows.foreach { case (_, v, _) => n += 1; mx = math.max(mx, v) }
    totals.update((n, mx))
    // keep exactly one live timer per key, re-armed past the current
    // watermark each time the key sees data
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[(Long, Long, Double)] = {
    val (n, mx) = totals.get()
    totals.clear()
    Iterator.single((user, n, mx))
  }
}

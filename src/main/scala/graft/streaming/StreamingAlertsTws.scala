package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.types.StringType

import graft.functions.Paths
import graft.model.AlertDoc
import graft.model.AlertDoc.Doc
import graft.streaming.StreamingAlerts.StreamAlert

/** Deadman state for the transformWithState variant: last event-time
  * seen for the key and the single armed timer (so refreshes replace
  * the timer instead of accumulating stale ones). Top-level class —
  * encoder codegen cannot reach nested/private case classes.
  */
case class DeadmanTwsState(lastMs: Long, timerMs: Long)

/** The deadman monitor as a Spark 4 `transformWithState`
  * StatefulProcessor — the successor API to flatMapGroupsWithState
  * with explicit typed state and first-class timers (requires the
  * RocksDB state store provider). Semantics identical to
  * [[StreamingAlerts.deadmanStream]]: every qualifying event refreshes
  * the key; when the watermark passes last-seen + lifespan with no
  * refresh, the alert fires once and the state clears so a comeback
  * re-arms it.
  */
class DeadmanProcessor(name: String, lifespanMs: Long)
    extends StatefulProcessor[String, (String, Timestamp), StreamAlert] {

  @transient private var st: org.apache.spark.sql.streaming.ValueState[DeadmanTwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[DeadmanTwsState](
      "deadman", Encoders.product[DeadmanTwsState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Timestamp)],
      timerValues: TimerValues): Iterator[StreamAlert] = {
    val maxMs = rows.map(_._2.getTime).max
    val prev = Option(st.get())
    val last = math.max(prev.map(_.lastMs).getOrElse(0L), maxMs)
    // timers below the watermark are invalid — clamp to the next tick
    val timer = math.max(last + lifespanMs, timerValues.getCurrentWatermarkInMs() + 1)
    prev.map(_.timerMs).filter(_ != timer).foreach(getHandle.deleteTimer)
    if (!prev.exists(_.timerMs == timer)) getHandle.registerTimer(timer)
    st.update(DeadmanTwsState(last, timer))
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[StreamAlert] = {
    val last = Option(st.get()).map(_.lastMs).getOrElse(0L)
    st.clear() // re-arms when the key comes back
    Iterator.single(StreamAlert(name, key, 0L,
      new Timestamp(last), new Timestamp(last + lifespanMs),
      s"$name: expected events from $key are missing"))
  }
}

object StreamingAlertsTws {

  /** [[StreamingAlerts.deadmanStream]] re-expressed on the
    * transformWithState API. The input plumbing (watermark before the
    * criteria filter so any lake traffic advances the clock, cast
    * before watermark) is shared verbatim — only the keyed-state
    * machinery differs.
    */
  def deadmanStreamTws(events: DataFrame, spec: Doc,
      tsCol: String = "ts", lifespan: String = "1 hour",
      watermarkDelay: String = "10 minutes"): Dataset[StreamAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val lifespanMs = graft.functions.Dates.interval(
      AlertDoc.str(spec, "lifespan", lifespan)).toMillis
    val keyed = StreamingAlerts.deadmanKeyed(events, spec, tsCol, watermarkDelay)
    keyed.transformWithState(
      new DeadmanProcessor(name, lifespanMs), TimeMode.EventTime(), OutputMode.Append)
  }
}

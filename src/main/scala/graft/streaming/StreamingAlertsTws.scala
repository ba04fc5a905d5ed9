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

/** One buffered event for the streaming sequence: slot membership
  * flag (slot-0/threshold vs slot-1/deadman family), event-time
  * millis, and the id tiebreaker. Top-level — encoder codegen cannot
  * reach nested case classes.
  */
case class SeqBufEvent(isA: Boolean, tsUs: Long, id: Long)

/** The armed flush timer (wrapped so absent state is null, not 0). */
case class SeqTimerState(timerMs: Long)

/** Completed streaming sequence alert: slot-0 trip time, slot-1
  * deadman count, the RENDERED slot-1 criteria (the cross-slot
  * template reference resolved against slot-0's data — the
  * reference's `assert "bitwarden" in criteria` shape,
  * tests/test_alerts.py:406-408) and the final summary.
  */
case class StreamSeqAlert(alert_name: String, value: String,
    t0_us: Long, b_count: Long, criteria: String, summary: String)

/** The threshold→deadman sequence (tests/test_alerts.py:345-435's
  * scenario) as ONE `transformWithState` StatefulProcessor — the
  * streaming twin of [[graft.engine.SequenceEngine]]'s driver loop.
  *
  * Batch engine: slot N's criteria is Mustache-rendered against slots
  * 0..N-1 and synthesizes a NEW lake query per sequence. Streaming
  * twin: the cross-slot reference is the grouping key (slot-1's
  * rendered criteria pins slot-0's aggregation value), so one keyed
  * state machine per value evaluates both slots incrementally —
  * slot-0 trips when the T-th qualifying event (event-time order,
  * id tiebreak) arrives; the deadman window (t0, t0+lifespan] then
  * counts slot-1-family events, and the sequence completes when the
  * WATERMARK passes the deadline with ≤ `deadmanMax` of them. The
  * rendered criteria/summary are produced by the same
  * [[graft.functions.Template]] walker the batch engine uses, on the
  * executor, against the same slots-doc shape.
  *
  * Scale shape: state per key is the key's buffered event handles
  * (bounded by the lifespan horizon — RocksDB-backed), timers replace
  * rather than accumulate, and completion clears state so the key
  * re-arms.
  */
class SequenceTwsProcessor(name: String, thresholdT: Int, deadmanMax: Long,
    lifespanMs: Long, criteriaTpl: String, summaryTpl: String)
    extends StatefulProcessor[String, (String, Boolean, Long, Long), StreamSeqAlert] {

  @transient private var buf: org.apache.spark.sql.streaming.ListState[SeqBufEvent] = _
  @transient private var armed: org.apache.spark.sql.streaming.ValueState[SeqTimerState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[SeqBufEvent](
      "buf", Encoders.product[SeqBufEvent], TTLConfig.NONE)
    armed = getHandle.getValueState[SeqTimerState](
      "armed", Encoders.product[SeqTimerState], TTLConfig.NONE)
  }

  private def rearm(at: Long): Unit = {
    val prev = Option(armed.get()).map(_.timerMs)
    if (!prev.contains(at)) {
      prev.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(at)
      armed.update(SeqTimerState(at))
    }
  }

  // event times travel as epoch-MICROS (the lake's native precision —
  // Timestamp.getTime would truncate to ms and silently diverge from
  // the µs-exact oracle); only the timer clock is ms.
  override def handleInputRows(key: String,
      rows: Iterator[(String, Boolean, Long, Long)],
      timerValues: TimerValues): Iterator[StreamSeqAlert] = {
    rows.foreach(r => buf.appendValue(SeqBufEvent(r._2, r._3, r._4)))
    // flush check on the next watermark tick; handleExpiredTimer
    // re-arms at the real deadline if the window is still open
    rearm(timerValues.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[StreamSeqAlert] = {
    val evs = buf.get().toVector
    val as = evs.filter(_.isA).sortBy(e => (e.tsUs, e.id))
    if (as.size < thresholdT) { Iterator.empty } // slot 0 not tripped yet
    else {
      val t0Us = as(thresholdT - 1).tsUs
      val deadlineUs = t0Us + lifespanMs * 1000L
      if (timerValues.getCurrentWatermarkInMs() * 1000L < deadlineUs) {
        // slot-1 window still open — wait it out (ceil to the ms tick
        // at-or-after the µs deadline)
        rearm((deadlineUs + 999L) / 1000L)
        Iterator.empty
      } else {
        val b = evs.count(e => !e.isA && e.tsUs > t0Us && e.tsUs <= deadlineUs)
        buf.clear(); armed.clear() // completion re-arms the key
        if (b > deadmanMax) Iterator.empty
        else {
          // the slots doc the batch engine would hold at this point:
          // slot 0 triggered with its aggregation value/count — the
          // cross-slot template refs resolve against it
          val doc: AlertDoc.Doc = Map(
            "alert_name" -> name,
            "slots" -> Seq(
              Map("metadata" -> Map("value" -> key, "count" -> as.size),
                "triggered" -> true),
              Map("metadata" -> Map("value" -> key, "count" -> b))))
          Iterator.single(StreamSeqAlert(name, key, t0Us, b,
            graft.functions.Template.render(criteriaTpl, doc),
            graft.functions.Template.render(summaryTpl, doc)))
        }
      }
    }
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

  /** The threshold→deadman SEQUENCE as a stream (the reference's
    * tests/test_alerts.py:345-435 scenario: "root login without a
    * corresponding password manager access"). `spec` is the same
    * sequence-shell doc the batch [[graft.engine.SequenceEngine]]
    * consumes — slot 0 a threshold spec (criteria + aggregation_key +
    * threshold), slot 1 a deadman spec whose `criteria` may carry a
    * cross-slot template reference; the processor renders it against
    * slot-0's data and emits it on the completed alert.
    *
    * `slot1Family` is the template-free part of slot-1's criteria (the
    * event family the deadman watches) — needed up front because the
    * streaming filter runs BEFORE per-key state exists; the rendered
    * criteria's key-pinning clause is enforced structurally by the
    * groupByKey.
    */
  def sequenceStreamTws(events: DataFrame, spec: Doc,
      slot1Family: org.apache.spark.sql.Column,
      tsCol: String = "ts", idCol: String = "event_id",
      watermarkDelay: String = "10 minutes"): Dataset[StreamSeqAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val lifespanMs = graft.functions.Dates.interval(
      AlertDoc.str(spec, "lifespan", "1 hour")).toMillis
    val slots = AlertDoc.docs(spec, "slots")
    require(slots.size == 2, s"sequenceStreamTws wants 2 slots, got ${slots.size}")
    val (slot0, slot1) = (slots(0), slots(1))
    val thresholdT = AlertDoc.str(slot0, "threshold", "1").toInt
    val deadmanMax = AlertDoc.str(slot1, "threshold", "0").toLong
    val keyCol = Paths.column(events.schema,
      AlertDoc.str(slot0, "aggregation_key")).cast(StringType)
    val slot0Col = StreamingAlerts.criteriaColumn(slot0)
    val keyed = StreamingAlerts.whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__k", keyCol)
        .withColumn("__isA", coalesce(slot0Col, lit(false))),
      (col("__isA") || coalesce(slot1Family, lit(false))) &&
        col("__k").isNotNull && col("__ts").isNotNull &&
        col(idCol).isNotNull)
      .select(col("__k"), col("__isA"), unix_micros(col("__ts")).as("__us"),
        col(idCol).cast("long").as("__id"))
      .as[(String, Boolean, Long, Long)]
      .groupByKey(_._1)
    keyed.transformWithState(
      new SequenceTwsProcessor(name, thresholdT, deadmanMax, lifespanMs,
        AlertDoc.str(slot1, "criteria"), AlertDoc.str(spec, "summary")),
      TimeMode.EventTime(), OutputMode.Append)
  }
}

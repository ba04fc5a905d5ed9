package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StringType

import graft.criteria.Criteria
import graft.functions.Paths
import graft.model.AlertDoc
import graft.model.AlertDoc.Doc

/** Streaming alert evaluation (SURVEY.md §2.8 note / BASELINE.json
  * north star): the cron-batch 2-hour lookback becomes watermarked
  * event-time windows; inflight sequence state becomes keyed state in
  * `flatMapGroupsWithState`.
  *
  * Contract differences from batch, by design:
  *   - threshold: one alert per (window, group) instead of per run —
  *     the window IS the dedup, so the A2 anti-join disappears.
  *   - deadman: absence can't be aggregated (empty groups emit no
  *     rows); it's a keyed event-time timeout — when the watermark
  *     passes last-seen + lifespan, the alert fires.
  *   - sequence: slot criteria are compiled once against the stream
  *     (static criteria only — the batch engine remains the home of
  *     cross-slot *templated* criteria, which synthesize SQL from
  *     data and cannot be one static DAG).
  */
object StreamingAlerts {

  case class StreamAlert(alert_name: String, value: String, count: Long,
      window_start: Timestamp, window_end: Timestamp, summary: String)

  /** G2 as a stream: criteria filter → watermark → tumbling-window
    * group-count → threshold filter. Emits in append mode when the
    * watermark closes a window.
    */
  def thresholdStream(events: DataFrame, spec: Doc,
      tsCol: String = "ts", windowDuration: String = "15 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val th = AlertDoc.int(spec, "threshold", 1)
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val keyCol = Paths.column(events.schema, AlertDoc.str(spec, "aggregation_key"))
      .cast(StringType)
    events
      .where(Criteria.toColumn(AlertDoc.str(spec, "criteria", "true")))
      .withColumn("__value", keyCol)
      .where(col("__value").isNotNull)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col("__value"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= th)
      .select(
        lit(name).as("alert_name"),
        col("__value").as("value"),
        col("cnt").as("count"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        concat(lit(s"$name: "), col("__value"), lit(" x"), col("cnt")).as("summary"))
  }

  case class LastSeen(lastMs: Long)

  /** G3 as a stream: keyed event-time timeout. Every qualifying event
    * refreshes the key's state; when the watermark passes
    * last-seen + lifespan with no refresh, the deadman fires (once per
    * silence — state resets so a comeback re-arms it).
    */
  def deadmanStream(events: DataFrame, spec: Doc,
      tsCol: String = "ts", lifespan: String = "1 hour",
      watermarkDelay: String = "10 minutes"): Dataset[StreamAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val lifespanMs = graft.functions.Dates.interval(lifespan).toMillis
    val keyCol = Paths.column(events.schema, AlertDoc.str(spec, "aggregation_key"))
      .cast(StringType)

    // select/cast BEFORE withWatermark — a cast afterwards mints a new
    // attribute without the watermark tag and event-time timeout breaks
    val keyed = events
      .where(Criteria.toColumn(AlertDoc.str(spec, "criteria", "true")))
      .withColumn("__value", keyCol)
      .where(col("__value").isNotNull)
      .select(col("__value").as("k"), col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)

    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: String, rows: Iterator[(String, Timestamp)],
       state: GroupState[LastSeen]) => {
        if (state.hasTimedOut) {
          val last = state.getOption.map(_.lastMs).getOrElse(0L)
          state.remove() // re-arms when the key comes back
          Iterator.single(StreamAlert(name, key, 0L,
            new Timestamp(last), new Timestamp(last + lifespanMs),
            s"$name: expected events from $key are missing"))
        } else {
          val maxMs = rows.map(_._2.getTime).max
          val prev = state.getOption.map(_.lastMs).getOrElse(0L)
          val last = math.max(prev, maxMs)
          state.update(LastSeen(last))
          state.setTimeoutTimestamp(last + lifespanMs)
          Iterator.empty
        }
      })
  }

  case class SlotProgress(next: Int, slotNames: List[String], startedMs: Long)

  /** Q1-Q2 as a stream, static-criteria form: per correlation key, a
    * slot cursor advances whenever the current slot's (pre-compiled)
    * predicate matches an event; completing the last slot emits one
    * alert and resets. Slot predicates are evaluated in the plan (one
    * boolean array column), so the state function never parses SQL.
    */
  def sequenceStream(events: DataFrame, spec: Doc,
      tsCol: String = "ts", watermarkDelay: String = "10 minutes"): Dataset[StreamAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val slots = AlertDoc.docs(spec, "slots")
    require(slots.nonEmpty, "sequence spec needs slots")
    // lifespan (Q3): a partially-filled sequence expires when the
    // watermark passes its start + lifespan — the streaming analogue
    // of expire_sequence_alerts (alerta.py:240-248)
    val lifespanMs = graft.functions.Dates
      .interval(AlertDoc.str(spec, "lifespan", "3 days")).toMillis
    val keyCol = Paths.column(events.schema, AlertDoc.str(spec, "aggregation_key"))
      .cast(StringType)
    // coalesce each predicate: SQL three-valued logic can yield NULL
    // (missing JSON key, null column), and a null element in the
    // Seq[Boolean]-encoded array would kill the streaming query
    val slotMatch: Column = array(slots.map(s =>
      coalesce(Criteria.toColumn(AlertDoc.str(s, "criteria", "false")), lit(false))): _*)

    val keyed = events
      .withColumn("__value", keyCol)
      .where(col("__value").isNotNull)
      .select(col("__value").as("k"), col(tsCol).cast("timestamp").as("ts"),
        slotMatch.as("m"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp, Seq[Boolean])]
      .groupByKey(_._1)

    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
      (key: String, rows: Iterator[(String, Timestamp, Seq[Boolean])],
       state: GroupState[SlotProgress]) => {
        if (state.hasTimedOut) {
          // lifespan exceeded with slots unfilled → expire silently,
          // like expire_sequence_alerts (no alert emitted)
          state.remove()
          Iterator.empty
        } else {
          var st = state.getOption.getOrElse(SlotProgress(0, Nil, 0L))
          val out = List.newBuilder[StreamAlert]
          // event-time order within the batch so slot order is honored
          rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, m) =>
            if (st.next < slots.size && m(st.next)) {
              val started = if (st.next == 0) ts.getTime else st.startedMs
              val named = st.slotNames :+
                AlertDoc.str(slots(st.next), "alert_name", s"slot${st.next}")
              st = SlotProgress(st.next + 1, named, started)
              if (st.next == slots.size) {
                out += StreamAlert(name, key, slots.size.toLong, ts, ts,
                  s"$name: sequence [${named.mkString(" -> ")}] completed by $key")
                st = SlotProgress(0, Nil, 0L)
              }
            }
          }
          state.update(st)
          if (st.next > 0) state.setTimeoutTimestamp(st.startedMs + lifespanMs)
          out.result().iterator
        }
      })
  }
}

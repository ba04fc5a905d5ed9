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
    // cast then watermark FIRST (same rule as deadmanKeyed: a cast
    // after withWatermark mints an untagged attribute), and watermark
    // BEFORE the criteria filter: the event-time clock must advance on
    // ANY lake traffic, or a quiet criteria would freeze window
    // close-out (and for deadman, starve the very absence signal it
    // exists to detect)
    whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__value", keyCol),
      // null event times are EXPLICITLY out of contract (window()
      // would silently drop them anyway — make the drop part of the
      // declared semantics so oracles state it too)
      criteriaColumn(spec) && col("__value").isNotNull && col("__ts").isNotNull)
      .groupBy(window(col("__ts"), windowDuration), col("__value"))
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

  /** Blank criteria means "everything" (shells default to "" when the
    * author omits it); NULL from three-valued logic never passes.
    */
  private def criteriaColumn(spec: Doc): Column = {
    val text = AlertDoc.str(spec, "criteria").trim
    if (text.isEmpty) lit(true) else coalesce(Criteria.toColumn(text), lit(false))
  }

  /** Filter that STAYS above the watermark node. Catalyst pushes
    * deterministic predicates through EventTimeWatermark, which would
    * re-starve the event-time clock the moment criteria traffic stops
    * (the exact condition a deadman watches for). Marking the
    * predicate non-deterministic pins it: every lake event reaches the
    * watermark operator, then the filter applies.
    */
  private val clockSafeFilter =
    udf((b: Boolean) => b).asNondeterministic()

  private def whereAfterWatermark(df: DataFrame, pred: Column): DataFrame =
    df.where(clockSafeFilter(coalesce(pred, lit(false))))

  case class LastSeen(lastMs: Long)

  /** G3 as a stream: keyed event-time timeout. Every qualifying event
    * refreshes the key's state; when the watermark passes
    * last-seen + lifespan with no refresh, the deadman fires (once per
    * silence — state resets so a comeback re-arms it).
    */
  /** Shared deadman input plumbing: cast then watermark FIRST (a cast
    * after withWatermark mints an untagged attribute), and before the
    * criteria filter so the clock advances on any traffic — a deadman
    * whose monitored events go totally silent must still see the
    * watermark move. Used by both the flatMapGroupsWithState and the
    * transformWithState ([[StreamingAlertsTws]]) variants.
    */
  private[streaming] def deadmanKeyed(events: DataFrame, spec: Doc,
      tsCol: String, watermarkDelay: String)
      : org.apache.spark.sql.KeyValueGroupedDataset[String, (String, Timestamp)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyCol = Paths.column(events.schema, AlertDoc.str(spec, "aggregation_key"))
      .cast(StringType)
    whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__value", keyCol),
      criteriaColumn(spec) && col("__value").isNotNull && col("__ts").isNotNull)
      .select(col("__value").as("k"), col("__ts").as("ts"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
  }

  def deadmanStream(events: DataFrame, spec: Doc,
      tsCol: String = "ts", lifespan: String = "1 hour",
      watermarkDelay: String = "10 minutes"): Dataset[StreamAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    // the spec's lifespan wins (same knob the batch engine reads);
    // the parameter is only the default for spec-less callers
    val lifespanMs = graft.functions.Dates.interval(
      AlertDoc.str(spec, "lifespan", lifespan)).toMillis
    val keyed = deadmanKeyed(events, spec, tsCol, watermarkDelay)

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
          // a timeout below the current watermark throws and kills the
          // query (a short lifespan + watermark delay can produce one);
          // clamping fires the timeout at the next watermark advance
          state.setTimeoutTimestamp(
            math.max(last + lifespanMs, state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        }
      })
  }

  /** `hits` counts matching events toward the CURRENT slot's
    * threshold; the slot advances when hits reaches it (batch parity:
    * Trigger.threshold fills a slot once its per-key count meets the
    * slot threshold).
    */
  case class SlotProgress(next: Int, slotNames: List[String], startedMs: Long,
      hits: Int = 0)

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
    // streaming contract: a slot advances once `threshold` matching
    // events arrive (default 1). Deadman (absence) slots remain
    // batch-only semantics — reject rather than silently invert them.
    require(slots.forall(s =>
      AlertDoc.str(s, "alert_type", "threshold") == "threshold"),
      "sequenceStream supports threshold slots; " +
        "deadman slots need the batch SequenceEngine")
    val thresholds: IndexedSeq[Int] =
      slots.map(s => math.max(AlertDoc.int(s, "threshold", 1), 1)).toIndexedSeq
    // lifespan (Q3): a partially-filled sequence expires when the
    // watermark passes its start + lifespan — the streaming analogue
    // of expire_sequence_alerts (alerta.py:240-248)
    val lifespanMs = graft.functions.Dates
      .interval(AlertDoc.str(spec, "lifespan", "3 days")).toMillis
    val keyCol = Paths.column(events.schema, AlertDoc.str(spec, "aggregation_key"))
      .cast(StringType)
    // coalesce each predicate: SQL three-valued logic can yield NULL
    // (missing JSON key, null column), and a null element in the
    // Seq[Boolean]-encoded array would kill the streaming query;
    // blank criteria (shell default) matches nothing for a slot
    val slotMatch: Column = array(slots.map { s =>
      val text = AlertDoc.str(s, "criteria").trim
      if (text.isEmpty) lit(false)
      else coalesce(Criteria.toColumn(text), lit(false))
    }: _*)

    val keyed = whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__value", keyCol),
      col("__value").isNotNull && col("__ts").isNotNull)
      .select(col("__value").as("k"), col("__ts").as("ts"), slotMatch.as("m"))
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
          val wm = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(SlotProgress(0, Nil, 0L))
          // inline expiry: the timeout callback only fires for keys
          // with no traffic — a chatty key crossing its deadline
          // expires here instead
          if ((st.next > 0 || st.hits > 0) && wm > st.startedMs + lifespanMs)
            st = SlotProgress(0, Nil, 0L)
          val out = List.newBuilder[StreamAlert]
          // event-time order within the batch so slot order is honored
          rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, m) =>
            if (st.next < slots.size && m(st.next)) {
              // the sequence clock starts at the FIRST matching event
              // of slot 0, even before its threshold fills
              val started =
                if (st.next == 0 && st.hits == 0) ts.getTime else st.startedMs
              val hits = st.hits + 1
              if (hits >= thresholds(st.next)) {
                val named = st.slotNames :+
                  AlertDoc.str(slots(st.next), "alert_name", s"slot${st.next}")
                st = SlotProgress(st.next + 1, named, started)
                if (st.next == slots.size) {
                  out += StreamAlert(name, key, slots.size.toLong, ts, ts,
                    s"$name: sequence [${named.mkString(" -> ")}] completed by $key")
                  st = SlotProgress(0, Nil, 0L)
                }
              } else st = SlotProgress(st.next, st.slotNames, started, hits)
            }
          }
          if (st.next == 0 && st.hits == 0) {
            // no in-flight progress: drop the state entry entirely —
            // keeping it would grow the store by one row per distinct
            // key ever seen
            if (state.exists) state.remove()
          } else {
            state.update(st)
            // clamp: a timeout at/below the watermark throws and kills
            // the query
            state.setTimeoutTimestamp(math.max(st.startedMs + lifespanMs, wm + 1))
          }
          out.result().iterator
        }
      })
  }
}

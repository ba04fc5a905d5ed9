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

/** One buffered event for the N-slot streaming sequence: a bitmask of
  * the slot families the event belongs to (bit k set = matches slot
  * k's template-free family predicate), event-time micros, and the id
  * tiebreaker. Top-level — encoder codegen cannot reach nested case
  * classes.
  */
case class NSeqEvent(mask: Long, tsUs: Long, id: Long)

/** Chain progress for the N-slot sequence: next slot to fill, trip
  * times of the filled slots (µs), progress count inside the current
  * threshold slot, and the running window count when the final slot
  * is a deadman. Only FINALIZED events (below the watermark) ever
  * advance the chain, so this state is replay-stable.
  */
case class NSeqChain(slotIdx: Int, trips: Seq[Long], curCount: Long,
    dmCount: Long, counts: Seq[Long])

/** One slot of the N-slot streaming sequence: kind ("threshold" |
  * "deadman"), trigger threshold, and — for deadman slots — the
  * slot's own window in ms (0 = the rest of the sequence window).
  */
case class NSeqSlot(kind: String, threshold: Long, windowMs: Long)

/** Completed N-slot streaming sequence alert: slot-0 trip time, the
  * last THRESHOLD slot's trip time, the final deadman window count
  * (0 when the last slot is a threshold), the rendered last-slot
  * criteria and the final summary.
  */
case class StreamNSeqAlert(alert_name: String, value: String,
    t0_us: Long, t_last_us: Long, dm_count: Long, criteria: String,
    summary: String)

/** Compacted summary of FINALIZED events (event time below the
  * watermark — Spark's late-row filter guarantees no future arrival
  * can be ordered before them, so their contribution is fixed):
  * total finalized slot-0 count, finalized in-window slot-1 count,
  * and the first `threshold` slot-0 events in (ts, id) order (enough
  * to pin t0 — every unfinalized event sorts after them). Keeps per-
  * key state bounded by the watermark delay instead of the stream's
  * lifetime.
  */
case class SeqCompact(aCntFinal: Long, bCntFinal: Long,
    firstA: Seq[SeqBufEvent])

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
  * Scale shape: each timer tick compacts events finalized by the
  * watermark into a [[SeqCompact]] summary (counts + the first
  * `threshold` slot-0 events), so RocksDB state per key is bounded by
  * the watermark-delay horizon — not the stream's lifetime; timers
  * replace rather than accumulate, and completion clears state so the
  * key re-arms.
  */
class SequenceTwsProcessor(name: String, thresholdT: Int, deadmanMax: Long,
    lifespanMs: Long, criteriaTpl: String, summaryTpl: String)
    extends StatefulProcessor[String, (String, Boolean, Long, Long), StreamSeqAlert] {

  @transient private var buf: org.apache.spark.sql.streaming.ListState[SeqBufEvent] = _
  @transient private var armed: org.apache.spark.sql.streaming.ValueState[SeqTimerState] = _
  @transient private var compact: org.apache.spark.sql.streaming.ValueState[SeqCompact] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[SeqBufEvent](
      "buf", Encoders.product[SeqBufEvent], TTLConfig.NONE)
    armed = getHandle.getValueState[SeqTimerState](
      "armed", Encoders.product[SeqTimerState], TTLConfig.NONE)
    compact = getHandle.getValueState[SeqCompact](
      "compact", Encoders.product[SeqCompact], TTLConfig.NONE)
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
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val c0 = Option(compact.get()).getOrElse(SeqCompact(0L, 0L, Nil))

    // Compact: fold events finalized by the watermark (ts < wm — no
    // future arrival can be ordered before them) into the summary.
    //  * slot-0: bump the finalized count, keep only the first
    //    `thresholdT` in (ts, id) order — enough to pin t0, since
    //    every unfinalized event has ts ≥ wm > any finalized ts.
    //  * slot-1: if t0 is already pinned by finalized slot-0 events,
    //    count window members exactly; otherwise drop them — any
    //    future t0 is ≥ wm > their ts, so the (t0, t0+lifespan]
    //    window can never admit them.
    val evs = buf.get().toVector
    val (fin, act) = evs.partition(_.tsUs < wmUs)
    val finA = fin.filter(_.isA)
    val aCntFinal = c0.aCntFinal + finA.size
    val firstA = (c0.firstA ++ finA).sortBy(e => (e.tsUs, e.id))
      .take(thresholdT)
    val t0Fixed = if (aCntFinal >= thresholdT)
      Some(firstA(thresholdT - 1).tsUs) else None
    val bCntFinal = c0.bCntFinal + (t0Fixed match {
      case Some(t0) => fin.count(e =>
        !e.isA && e.tsUs > t0 && e.tsUs <= t0 + lifespanMs * 1000L)
      case None => 0L
    })
    def persist(): Unit = {
      compact.update(SeqCompact(aCntFinal, bCntFinal, firstA))
      buf.clear()
      if (act.nonEmpty) buf.appendList(act.toArray)
    }

    val actA = act.filter(_.isA).sortBy(e => (e.tsUs, e.id))
    val allA = firstA ++ actA // firstA all < wm ≤ actA: already ordered
    val aTotal = aCntFinal + actA.size
    if (allA.size < thresholdT) { persist(); Iterator.empty } // slot 0 not tripped yet
    else {
      val t0Us = allA(thresholdT - 1).tsUs
      val deadlineUs = t0Us + lifespanMs * 1000L
      if (wmUs < deadlineUs) {
        // slot-1 window still open — wait it out (ceil to the ms tick
        // at-or-after the µs deadline)
        rearm((deadlineUs + 999L) / 1000L)
        persist()
        Iterator.empty
      } else {
        val b = bCntFinal +
          act.count(e => !e.isA && e.tsUs > t0Us && e.tsUs <= deadlineUs)
        buf.clear(); armed.clear(); compact.clear() // completion re-arms the key
        if (b > deadmanMax) Iterator.empty
        else {
          // the slots doc the batch engine would hold at this point:
          // slot 0 triggered with its aggregation value/count — the
          // cross-slot template refs resolve against it
          val doc: AlertDoc.Doc = Map(
            "alert_name" -> name,
            "slots" -> Seq(
              Map("metadata" -> Map("value" -> key, "count" -> aTotal),
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

/** The N-slot sequence state machine on `transformWithState` — the
  * streaming twin of [[graft.engine.SequenceEngine]]'s full N-slot
  * driver loop (alerta.py:274-317 fills slots strictly in order;
  * deadman slots are legal at ANY position > 0, alerta.py:310-316).
  *
  * Semantics: slot 0 is a threshold keyed by the aggregation value.
  * A threshold slot k trips at its T_k-th family event inside
  * `(t_{k-1}, t_0 + lifespan]` in (event-time, id) order. A deadman
  * slot k watches `(t_{k-1}, end_k]` with
  * `end_k = min(t_{k-1} + window_k, t_0 + lifespan)` (window_k = the
  * slot's own `lifespan`; 0 = the rest of the sequence window): when
  * the clock passes end_k with ≤ `threshold` family events the slot
  * trips AT end_k and the chain continues; with more, the sequence
  * ABORTS silently (the quiet period was violated). A sequence whose
  * window closes mid-chain expires silently
  * (expire_sequence_alerts, alerta.py:240-248).
  *
  * Only watermark-FINALIZED events advance the chain (no future
  * arrival can be ordered before them — Spark's late-row filter), so
  * trips are replay-stable and the buffer holds at most one
  * watermark-delay of events per key; deadman windows evaluate
  * in-fold once a finalized event passes their end, or against the
  * watermark (counting still-buffered actives exactly) at a timer.
  * Active events are also SIMULATED through the chain to arm the
  * next deadline timer early, so a key that goes silent after
  * tripping still completes when the global watermark passes its
  * boundary.
  *
  * Reported slot counts: threshold slots report their threshold (the
  * count that tripped them); deadman slots report their exact window
  * count.
  */
class NSeqTwsProcessor(name: String, slotSpecs: Seq[NSeqSlot],
    lifespanMs: Long, lastCriteriaTpl: String, summaryTpl: String)
    extends StatefulProcessor[String, (String, Long, Long, Long), StreamNSeqAlert] {

  require(slotSpecs.nonEmpty && slotSpecs.head.kind == "threshold",
    "slot 0 must be a threshold")
  require(slotSpecs.zipWithIndex.drop(1).dropRight(1).forall { case (sp, _) =>
    sp.kind == "threshold" || sp.windowMs > 0L },
    "a deadman at a middle position needs its own window (slot lifespan)")

  private val last = slotSpecs.size - 1
  private val lastIsDeadman = slotSpecs(last).kind == "deadman"
  private val lastThrIdx = slotSpecs.lastIndexWhere(_.kind == "threshold")
  private val lifespanUs = lifespanMs * 1000L

  @transient private var buf: org.apache.spark.sql.streaming.ListState[NSeqEvent] = _
  @transient private var chain: org.apache.spark.sql.streaming.ValueState[NSeqChain] = _
  @transient private var armed: org.apache.spark.sql.streaming.ValueState[SeqTimerState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[NSeqEvent](
      "nbuf", Encoders.product[NSeqEvent], TTLConfig.NONE)
    chain = getHandle.getValueState[NSeqChain](
      "nchain", Encoders.product[NSeqChain], TTLConfig.NONE)
    armed = getHandle.getValueState[SeqTimerState](
      "narmed", Encoders.product[SeqTimerState], TTLConfig.NONE)
  }

  private def rearm(at: Long): Unit = {
    val prev = Option(armed.get()).map(_.timerMs)
    if (!prev.contains(at)) {
      prev.foreach(getHandle.deleteTimer)
      getHandle.registerTimer(at)
      armed.update(SeqTimerState(at))
    }
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long, Long, Long)],
      timerValues: TimerValues): Iterator[StreamNSeqAlert] = {
    rows.foreach(r => buf.appendValue(NSeqEvent(r._2, r._3, r._4)))
    rearm(timerValues.getCurrentWatermarkInMs() + 1)
    Iterator.empty
  }

  private def seqEndUs(trips: Seq[Long]): Long = trips.head + lifespanUs

  /** Deadman slot k's window end: its own window capped by the
    * sequence deadline.
    */
  private def dmEndUs(k: Int, trips: Seq[Long]): Long = {
    val own = if (slotSpecs(k).windowMs > 0L)
      trips.last + slotSpecs(k).windowMs * 1000L else Long.MaxValue
    math.min(own, seqEndUs(trips))
  }

  /** Feed events (already (ts, id)-sorted) through the chain from the
    * given state. Deadman windows whose end a later finalized event
    * has passed evaluate in-fold (the window is fully finalized at
    * that point). Returns None when a deadman window was violated —
    * the sequence aborts.
    */
  private def advance(st: NSeqChain, evs: Seq[NSeqEvent]): Option[NSeqChain] = {
    var k = st.slotIdx; var trips = st.trips
    var cur = st.curCount; var dm = st.dmCount
    var counts = st.counts
    var aborted = false
    var idx = 0
    while (!aborted && idx < evs.size) {
      val e = evs(idx)
      // time-driven deadman trips this event's arrival finalizes (the
      // window is entirely below this finalized event, hence exact)
      while (!aborted && k <= last && slotSpecs(k).kind == "deadman" &&
          trips.nonEmpty && e.tsUs > dmEndUs(k, trips)) {
        if (dm <= slotSpecs(k).threshold) {
          trips = trips :+ dmEndUs(k, trips); counts = counts :+ dm
          k += 1; dm = 0L
        } else aborted = true // window violated — sequence aborts
      }
      if (!aborted) {
        if (k <= last && trips.nonEmpty && e.tsUs > seqEndUs(trips)) {
          // beyond the sequence deadline: nothing more can consume it
        } else if (k <= last && slotSpecs(k).kind == "threshold") {
          val afterPrev = trips.isEmpty || e.tsUs > trips.last
          if (((e.mask >> k) & 1L) == 1L && afterPrev) {
            cur += 1
            if (cur >= slotSpecs(k).threshold) {
              trips = trips :+ e.tsUs; counts = counts :+ cur
              k += 1; cur = 0L
            }
          }
        } else if (k <= last && slotSpecs(k).kind == "deadman" &&
            ((e.mask >> k) & 1L) == 1L && e.tsUs > trips.last &&
            e.tsUs <= dmEndUs(k, trips)) {
          dm += 1
        }
      }
      idx += 1
    }
    if (aborted) None else Some(NSeqChain(k, trips, cur, dm, counts))
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[StreamNSeqAlert] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val st0 = Option(chain.get()).getOrElse(NSeqChain(0, Nil, 0L, 0L, Nil))
    val evs = buf.get().toVector
    val (fin, act) = evs.partition(_.tsUs < wmUs)

    def clearAll(): Unit = { buf.clear(); chain.clear(); armed.clear() }
    def emit(st: NSeqChain): Iterator[StreamNSeqAlert] = {
      val slotDocs: Seq[AlertDoc.Doc] = slotSpecs.zipWithIndex.map {
        case (sp, i) =>
          val c = if (sp.kind == "deadman") st.counts(i) else sp.threshold
          Map("metadata" -> Map("value" -> key, "count" -> c),
            "triggered" -> true)
      }
      val doc: AlertDoc.Doc = Map("alert_name" -> name, "slots" -> slotDocs)
      val dmOut = if (lastIsDeadman) st.counts.last else 0L
      Iterator.single(StreamNSeqAlert(name, key, st.trips.head,
        st.trips(lastThrIdx), dmOut,
        graft.functions.Template.render(lastCriteriaTpl, doc),
        graft.functions.Template.render(summaryTpl, doc)))
    }

    advance(st0, fin.sortBy(e => (e.tsUs, e.id))) match {
      case None => clearAll(); Iterator.empty // deadman violated
      case Some(folded) =>
        // watermark-driven deadman trips: the window end has passed
        // the clock, so its membership is exact — count the still-
        // active in-window events too (they can only be at ts == end
        // == wm, and later slots start strictly after end)
        var st = folded; var aborted = false
        while (!aborted && st.slotIdx <= last &&
            slotSpecs(st.slotIdx).kind == "deadman" && st.trips.nonEmpty &&
            wmUs >= dmEndUs(st.slotIdx, st.trips)) {
          val k = st.slotIdx
          val end = dmEndUs(k, st.trips)
          val dmTot = st.dmCount + act.count(a =>
            ((a.mask >> k) & 1L) == 1L && a.tsUs > st.trips.last &&
              a.tsUs <= end)
          if (dmTot <= slotSpecs(k).threshold)
            st = NSeqChain(k + 1, st.trips :+ end, 0L, 0L,
              st.counts :+ dmTot)
          else aborted = true
        }
        if (aborted) { clearAll(); Iterator.empty }
        else if (st.slotIdx > last) { clearAll(); emit(st) }
        else if (st.trips.nonEmpty && wmUs >= seqEndUs(st.trips)) {
          // The watermark reached the sequence deadline with the chain
          // still open. The deadline is INCLUSIVE (window contract
          // `<= t0 + lifespan`), and when wm lands EXACTLY on it an
          // event AT the deadline is still active (ts >= wm) — fold
          // those boundary actives through the chain (the deadman loop
          // above counts them the same way) so a final-threshold trip
          // at the inclusive deadline still emits instead of being
          // silently expired. When wm is strictly past the deadline
          // the filter is empty and this is the plain expiry path.
          val boundary = act.filter(_.tsUs <= seqEndUs(st.trips))
            .sortBy(e => (e.tsUs, e.id))
          val res = advance(st, boundary) match {
            case Some(s2) if s2.slotIdx > last => emit(s2)
            case _ => Iterator.empty // expired mid-chain (or violated)
          }
          clearAll(); res
        } else {
          // persist; arm the nearest pending boundary. Candidates:
          // (a) the earliest still-active event's FINALIZATION tick —
          // the chain only advances on finalized events, so a key
          // whose inputs stop must still wake when the global
          // watermark passes its buffered events; (b) the pending
          // deadman window end / sequence deadline, from the real
          // chain or one PROVISIONALLY simulated through active
          // events, so a silent tripped key completes on time.
          chain.update(st)
          buf.clear()
          if (act.nonEmpty) buf.appendList(act.toArray)
          val chainBoundary = Some(st).filter(_.trips.nonEmpty)
            .orElse(advance(st, act.sortBy(e => (e.tsUs, e.id))).filter(_.trips.nonEmpty))
            .map { s =>
              val b = if (s.slotIdx <= last &&
                  slotSpecs(s.slotIdx).kind == "deadman")
                dmEndUs(s.slotIdx, s.trips) else seqEndUs(s.trips)
              (b + 999L) / 1000L
            }
          val actBoundary =
            if (act.isEmpty) None
            else Some(act.map(_.tsUs).min / 1000L + 1L)
          (chainBoundary.toSeq ++ actBoundary.toSeq)
            .minOption.foreach(rearm)
          Iterator.empty
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

  /** Split a criteria string on top-level ANDs (outside parens and
    * single-quoted strings) — the corpus's criteria are conjunctions,
    * and the template-bearing conjunct is always a whole conjunct.
    */
  private[graft] def topLevelConjuncts(criteria: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false; var i = 0
    val s = criteria
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { cur += c; if (c == '\'') inStr = false; i += 1 }
      else if (c == '\'') { cur += c; inStr = true; i += 1 }
      else if (c == '(') { depth += 1; cur += c; i += 1 }
      else if (c == ')') { depth -= 1; cur += c; i += 1 }
      else if (depth == 0 && (c == 'A' || c == 'a') &&
          i + 3 <= s.length &&
          s.substring(i, i + 3).equalsIgnoreCase("AND") &&
          (i == 0 || !s.charAt(i - 1).isLetterOrDigit && s.charAt(i - 1) != '_') &&
          (i + 3 == s.length || !s.charAt(i + 3).isLetterOrDigit && s.charAt(i + 3) != '_')) {
        out += cur.result(); cur.clear(); i += 3
      } else { cur += c; i += 1 }
    }
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** The template-free FAMILY part of a slot's criteria: drop every
    * top-level conjunct carrying a `{{…}}` cross-slot reference (those
    * resolve per key at render time — the key-pinning they express is
    * enforced structurally by the groupByKey). Empty result → `true`
    * (the slot watches every event of the key).
    *
    * CONTRACT for the all-templated edge: a slot whose criteria is
    * ENTIRELY template-bearing (no template-free conjunct at all)
    * deliberately gets the match-all family — every event of the key
    * advances it, and the templated criteria only surfaces RENDERED on
    * the emitted alert. This is correct when the templates express
    * key-pinning (the corpus shape); a template over a NON-key field
    * cannot be evaluated pre-state and is out of this contract —
    * authors must carry at least one template-free conjunct for such
    * slots. Spec-pinned in StreamingSpec ("ENTIRELY template-bearing").
    */
  private[graft] def familyCriteria(criteria: String): String =
    topLevelConjuncts(criteria).filterNot(_.contains("{{"))
      .mkString(" AND ")

  private[graft] def familyColumn(criteria: String): org.apache.spark.sql.Column = {
    val fam = familyCriteria(criteria).trim
    if (fam.isEmpty) lit(true)
    else coalesce(graft.criteria.Criteria.toColumn(fam), lit(false))
  }

  /** The full N-SLOT sequence as a stream — [[NSeqTwsProcessor]]'s
    * driver: derives each slot's family predicate from its criteria
    * automatically (template-bearing conjuncts stripped), tags each
    * event with a slot-membership bitmask, and runs one keyed chain
    * state machine per aggregation value. Slot 0 and middle slots are
    * thresholds; the final slot may be a threshold or a deadman.
    */
  def sequenceStreamTwsN(events: DataFrame, spec: Doc,
      tsCol: String = "ts", idCol: String = "event_id",
      watermarkDelay: String = "10 minutes"): Dataset[StreamNSeqAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val name = AlertDoc.str(spec, "alert_name", "unnamed")
    val lifespanMs = graft.functions.Dates.interval(
      AlertDoc.str(spec, "lifespan", "1 hour")).toMillis
    val slots = AlertDoc.docs(spec, "slots")
    require(slots.size >= 2, s"sequenceStreamTwsN wants ≥2 slots, got ${slots.size}")
    val slotSpecs = slots.map { s =>
      val w = AlertDoc.str(s, "lifespan", "")
      NSeqSlot(AlertDoc.str(s, "alert_type", "threshold"),
        AlertDoc.str(s, "threshold", "1").toLong,
        if (w.isEmpty) 0L else graft.functions.Dates.interval(w).toMillis)
    }
    val keyCol = Paths.column(events.schema,
      AlertDoc.str(slots.head, "aggregation_key")).cast(StringType)
    val famCols = slots.map(s => familyColumn(AlertDoc.str(s, "criteria")))
    val maskCol = famCols.zipWithIndex.map { case (c, i) =>
      when(coalesce(c, lit(false)), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    val keyed = StreamingAlerts.whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__k", keyCol)
        .withColumn("__mask", maskCol),
      col("__mask") =!= 0L && col("__k").isNotNull &&
        col("__ts").isNotNull && col(idCol).isNotNull)
      .select(col("__k"), col("__mask"),
        unix_micros(col("__ts")).as("__us"),
        col(idCol).cast("long").as("__id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
    keyed.transformWithState(
      new NSeqTwsProcessor(name, slotSpecs, lifespanMs,
        AlertDoc.str(slots.last, "criteria"), AlertDoc.str(spec, "summary")),
      TimeMode.EventTime(), OutputMode.Append)
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
    * groupByKey. Defaults to [[familyCriteria]]'s automatic
    * derivation (template-bearing conjuncts stripped); pass a Column
    * only to override it.
    */
  def sequenceStreamTws(events: DataFrame, spec: Doc,
      slot1Family: org.apache.spark.sql.Column = null,
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
    val fam1 = Option(slot1Family)
      .getOrElse(familyColumn(AlertDoc.str(slot1, "criteria")))
    val keyed = StreamingAlerts.whereAfterWatermark(
      events
        .withColumn("__ts", col(tsCol).cast("timestamp"))
        .withWatermark("__ts", watermarkDelay)
        .withColumn("__k", keyCol)
        .withColumn("__isA", coalesce(slot0Col, lit(false))),
      (col("__isA") || coalesce(fam1, lit(false))) &&
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

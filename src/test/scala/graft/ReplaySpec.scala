package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SequenceReplay

/** Batch ↔ streaming equivalence of the sequence semantics on the
  * MIDDLE-DEADMAN shape (q358's): the same spec drives the batch
  * SequenceEngine (via the SequenceReplay tick scheduler) and the
  * streaming N-slot transformWithState chain over identical events,
  * and the fired sets must coincide — including the abort (noisy
  * quiet-window) and never-completes cases. This is the spec-level
  * twin of the q361 oracle gate, on the shape where the two
  * implementations are most likely to diverge (time-driven middle
  * trips vs event-driven advancement).
  */
class ReplaySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
  def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 $hour%02d:$minute%02d:00")

  test("middle-deadman sequence: batch replay and streaming chain " +
      "fire identical (value, t0, t_last, dm_count) sets") {
    val spec: graft.model.AlertDoc.Doc = Map(
      "alert_name" -> "mid_dm_equiv",
      "alert_type" -> "sequence",
      "lifespan" -> "1 hour",
      "summary" -> "{{slots.1.metadata.count}} errors then clicks",
      "slots" -> Seq(
        Map("alert_type" -> "threshold",
          "criteria" -> "event_type='purchase'",
          "aggregation_key" -> "user_id",
          "threshold" -> 1, "event_sample_count" -> 0),
        Map("alert_type" -> "deadman",
          "criteria" -> ("event_type='error' AND " +
            "user_id='{{slots.0.metadata.value}}' AND " +
            "ts > CAST('{{slots.0.utctimestamp}}' AS TIMESTAMP)"),
          "aggregation_key" -> "user_id",
          "threshold" -> 1, "lifespan" -> "10 minutes",
          "event_sample_count" -> 0),
        Map("alert_type" -> "threshold",
          "criteria" -> ("event_type='click' AND " +
            "user_id='{{slots.0.metadata.value}}' AND " +
            "ts > CAST('{{slots.1.utctimestamp}}' AS TIMESTAMP)"),
          "aggregation_key" -> "user_id",
          "threshold" -> 2, "event_sample_count" -> 0)))

    // user 1: quiet window (1 error ≤ 1) → 2 clicks after its end →
    //   completes with t_last = the 2nd click.
    // user 2: 3 errors in the window → aborted; its clicks are noise.
    // user 3: quiet window but only ONE click → never completes.
    var id = 0L
    def ev(t: Timestamp, u: Long, ty: String): (Timestamp, Long, String, Long) = {
      id += 1; (t, u, ty, id)
    }
    val rows = Seq(
      ev(ts(0), 1, "purchase"), ev(ts(5), 1, "error"),
      ev(ts(15), 1, "click"), ev(ts(20), 1, "click"),
      ev(ts(0), 2, "purchase"), ev(ts(2), 2, "error"),
      ev(ts(4), 2, "error"), ev(ts(6), 2, "error"),
      ev(ts(15), 2, "click"), ev(ts(16), 2, "click"),
      ev(ts(0), 3, "purchase"), ev(ts(15), 3, "click"))

    // batch side: the replay scheduler driving the real SequenceEngine
    val df = rows.toDF("ts", "user_id", "event_type", "event_id")
    val batch = SequenceReplay.run(spark, df, spec)
      .map(f => (f.value, f.t0_us, f.t_last_us, f.dm_count)).toSet

    // streaming side: the same spec through the N-slot TWS chain
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long, String, Long)]
      val out = graft.streaming.StreamingAlertsTws.sequenceStreamTwsN(
        mem.toDF().toDF("ts", "user_id", "event_type", "event_id"),
        spec, watermarkDelay = "1 minute")
      val q = out.writeStream.format("memory").queryName("mid_dm_equiv")
        .outputMode(OutputMode.Append).start()
      try {
        mem.addData(rows: _*)
        q.processAllAvailable()
        // advance the watermark past every window boundary
        mem.addData(ev(tsH(12, 0), 9, "purchase"))
        q.processAllAvailable()
        mem.addData(ev(tsH(12, 1), 9, "purchase"))
        q.processAllAvailable()
        val stream = spark.table("mid_dm_equiv").collect()
          .filter(_.getAs[String]("value") != "9")
          .map(r => (r.getAs[String]("value"), r.getAs[Long]("t0_us"),
            r.getAs[Long]("t_last_us"), r.getAs[Long]("dm_count"))).toSet
        val usOf = (t: Timestamp) => t.getTime * 1000L
        assert(stream === Set(("1", usOf(ts(0)), usOf(ts(20)), 0L)))
        assert(batch === stream,
          s"batch $batch != stream $stream — the two sequence " +
            "implementations diverged")
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }
}

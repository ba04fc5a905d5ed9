package graft

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Runner
import graft.model.AlertDoc
import graft.store.{AlertStore, InflightStore}

/** End-to-end engine runs over the local events lake: the reference's
  * cron-run semantics (alerta.py:481-515) — 2-hour lookback window,
  * threshold dedup across runs, deadman re-firing every run.
  */
class RunnerSpec extends AnyFunSuite with SparkSuite {

  // inside the last hour of sf0.001 events (2024-01-01..2024-01-30)
  val now: Instant = Instant.parse("2024-01-30T23:30:00Z")

  def mkRunner(): Runner = {
    val dir = Files.createTempDirectory("graft-runner").toString
    new Runner(spark, new AlertStore(dir), new InflightStore(dir))
  }

  val thresholdSpec = Map[String, Any](
    "alert_name" -> "purchases", "alert_type" -> "threshold",
    "criteria" -> "event_type='purchase'",
    "summary" -> "user {{metadata.value}} purchased {{metadata.count}}x",
    "aggregation_key" -> "user_id", "threshold" -> 1,
    "event_sample_count" -> 0)

  val deadmanSpec = Map[String, Any](
    "alert_name" -> "no_refunds", "alert_type" -> "deadman",
    "criteria" -> "event_type='refund'",
    "summary" -> "expected refund events are missing",
    "aggregation_key" -> "user_id", "threshold" -> 0)

  test("run fires threshold alerts within the 2-hour window; dedup stops re-fire") {
    val runner = mkRunner()
    val lake = Tables(spark, sf(), "events")

    val stats1 = runner.runOnce(lake, Seq(thresholdSpec, deadmanSpec), now)
    assert(stats1.alertsSaved > 1) // >=1 threshold group + 1 deadman
    val saved = runner.alerts.all()
    val thresholds = saved.filter(d => AlertDoc.str(d, "alert_name") == "purchases")
    val deadmans = saved.filter(d => AlertDoc.str(d, "alert_name") == "no_refunds")
    assert(thresholds.nonEmpty)
    assert(thresholds.head("summary").toString.matches("user \\d+ purchased \\d+x"))
    assert(deadmans.size === 1)
    assert(deadmans.head("summary").toString.contains("expected refund events are missing"))
    // events were captured with ids for dedup
    assert(AlertDoc.seq(thresholds.head, "events").nonEmpty)

    // run 2 over the same window: threshold events already alerted →
    // A2 anti-join removes them, no new threshold alerts; the deadman
    // has no dedup and fires again (SURVEY.md §3.2).
    val before = runner.alerts.all().size
    runner.runOnce(lake, Seq(thresholdSpec, deadmanSpec), now)
    val after = runner.alerts.all()
    assert(after.count(d => AlertDoc.str(d, "alert_name") == "purchases") ===
      thresholds.size) // unchanged
    assert(after.count(d => AlertDoc.str(d, "alert_name") == "no_refunds") === 2)
  }

  test("window excludes events outside current+previous hour") {
    val runner = mkRunner()
    val lake = Tables(spark, sf(), "events")
    // a time where the lake has no events at all
    runner.runOnce(lake, Seq(thresholdSpec), Instant.parse("2030-01-01T00:00:00Z"))
    assert(runner.alerts.all().isEmpty)
  }

  test("sequence lifecycle end-to-end over the real lake (§3.3 phase order)") {
    val runner = mkRunner()
    val lake = Tables(spark, sf("sf0.01"), "events")
    val seqSpec = Map[String, Any](
      "alert_name" -> "purchase_then_error", "alert_type" -> "sequence",
      "lifespan" -> "1 hour",
      "summary" -> "user {{slots.1.metadata.value}} purchased then errored",
      "slots" -> Seq(
        Map[String, Any]("alert_name" -> "buy", "alert_type" -> "threshold",
          "criteria" -> "event_type='purchase'",
          "summary" -> "{{metadata.count}} purchases by {{metadata.value}}",
          "aggregation_key" -> "user_id", "threshold" -> 1, "event_sample_count" -> 0),
        Map[String, Any]("alert_name" -> "fail", "alert_type" -> "threshold",
          // cross-slot ref: the error must belong to the user captured
          // by slot 0 of THIS inflight doc
          "criteria" -> "event_type='error' AND user_id = {{slots.0.metadata.value}}",
          "summary" -> "error by {{metadata.value}}",
          "aggregation_key" -> "user_id", "threshold" -> 1, "event_sample_count" -> 0)))

    // run 1: slot 0 fires per purchasing user → one inflight doc per group
    runner.runOnce(lake, Seq(seqSpec), now)
    val created = runner.inflight.count
    assert(created > 1)
    assert(runner.alerts.all().isEmpty)

    // run 2: phase ① advances each inflight (rendered slot-1 criteria);
    // only user 54 purchased AND errored in the window → exactly one
    // sequence completes (phase ③) and leaves inflight
    runner.runOnce(lake, Seq(seqSpec), now)
    val completed = runner.alerts.all()
    assert(completed.size === 1)
    assert(completed.head("summary").toString === "user 54 purchased then errored")
    val slots = AlertDoc.docs(completed.head, "slots")
    assert(slots.forall(_.contains("events")))
    assert(runner.inflight.count === created - 1)
  }

  test("deadman with broken criteria skips — never false-fires on query failure") {
    val runner = mkRunner()
    val broken = deadmanSpec ++ Map("criteria" -> "THIS IS NOT ((( SQL")
    val stats = runner.runOnce(Tables(spark, sf(), "events"), Seq(broken), now)
    // a failed query must read as "unknown", not "zero events matched"
    assert(stats.alertsSaved === 0)
    assert(runner.alerts.all().isEmpty)
  }

  test("blank criteria means everything (batch/streaming contract parity)") {
    val runner = mkRunner()
    val noCriteria = thresholdSpec - "criteria"
    val stats = runner.runOnce(Tables(spark, sf(), "events"), Seq(noCriteria), now)
    // shells default criteria to "" — the spec evaluates over all
    // events instead of dying in expr("")
    assert(stats.alertsSaved > 0)
  }

  test("yaml specs load and dispatch (S6)") {
    val dir = Files.createTempDirectory("graft-specs")
    Files.writeString(dir.resolve("a.yml"),
      """alert_name: "purchases"
        |alert_type: "threshold"
        |criteria: "event_type='purchase'"
        |summary: "user {{metadata.value}} {{metadata.count}}"
        |aggregation_key: "user_id"
        |threshold: 1
        |""".stripMargin)
    val specs = graft.model.AlertSpecs.loadAll(dir.toString + "/*.yml")
    assert(specs.size === 1)
    assert(AlertDoc.str(specs.head, "alert_type") === "threshold")
    val runner = mkRunner()
    runner.runOnce(Tables(spark, sf(), "events"), specs, now)
    assert(runner.alerts.all().nonEmpty)
  }
}

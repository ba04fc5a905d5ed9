package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Trigger
import graft.model.Shells

/** Behavioral parity with the reference engine tests
  * (tests/test_alerts.py:204-276) — same golden substrings, fixtures
  * authored here with the same shapes (repo:FIXTURES.md §2/§4).
  */
class TriggerSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  def cloudtrailEvents: DataFrame = spark.read.json(Seq(
    """{"eventname":"ConsoleLogin","useridentity":{"type":"Root","arn":"arn:aws:iam::0123456789:root"},
       "additionaleventdata":{"mfaused":"No"},"responseelements":{"consolelogin":"Success"},
       "sourceipaddress":"6.9.9.93","eventid":"11111111-aaaa-0000-0000-000000000001","source":"cloudtrail"}""",
    """{"eventname":"ConsoleLogin","useridentity":{"type":"Root","arn":"arn:aws:iam::0123456789:root"},
       "additionaleventdata":{"mfaused":"No"},"responseelements":{"consolelogin":"Success"},
       "sourceipaddress":"6.7.8.93","eventid":"11111111-aaaa-0000-0000-000000000002","source":"cloudtrail"}""").toDS)

  def oneloginEvent: DataFrame = spark.read.json(Seq(
    """{"region":"us-east-1","source":"onelogin","eventid":"22222222-bbbb-0000-0000-000000000001",
       "detail":{"user_name":"jsmith","ipaddr":"1.2.3.4"}}""").toDS)

  test("threshold trigger resolves summary + snippets (golden substrings)") {
    val spec = Shells.threshold(Map(
      "alert_name" -> "test_threshold",
      "summary" -> "{{events.0.eventname}} by {{events.0.useridentity.type}} {{metadata.count}} mfa:{{events.0.additionaleventdata.mfaused}}",
      "event_snippet" -> "{{eventname}}/{{responseelements.consolelogin}} mfa:{{additionaleventdata.mfaused}} from {{sourceipaddress}}",
      "aggregation_key" -> "additionaleventdata.mfaused"))
    val alerts = Trigger.threshold(cloudtrailEvents, spec).collect()
    assert(alerts.length === 1)
    val summary = alerts.head.getAs[String]("summary")
    assert(summary.contains("ConsoleLogin by Root"))
    assert(summary.contains("from 6.9.9.93"))
    assert(summary.contains("from 6.7.8.93")) // both sampled (count 2 <= sample 3)
    assert(summary.contains(" 2 "))           // metadata.count renders as int
    val md = alerts.head.getStruct(alerts.head.fieldIndex("metadata"))
    assert(md.getAs[String]("value") === "No")
    assert(md.getAs[Long]("count") === 2L)
    assert(alerts.head.getAs[Boolean]("triggered"))
    assert(alerts.head.getSeq[Any](alerts.head.fieldIndex("events")).size === 2)
  }

  test("threshold below threshold does not fire") {
    val spec = Shells.threshold(Map(
      "aggregation_key" -> "additionaleventdata.mfaused", "threshold" -> 3))
    assert(Trigger.threshold(cloudtrailEvents, spec).isEmpty)
  }

  test("threshold groups split by aggregation key value") {
    val spec = Shells.threshold(Map(
      "aggregation_key" -> "sourceipaddress", "threshold" -> 1,
      "summary" -> "{{metadata.value}} {{metadata.count}}"))
    val alerts = Trigger.threshold(cloudtrailEvents, spec).collect()
    assert(alerts.length === 2) // one alert per IP group
    // trailing space: the reference appends " " + snippet per sampled
    // event even when event_snippet is "" (alerta.py:455-458) —
    // preserved quirk.
    assert(alerts.map(_.getAs[String]("summary")).toSet ===
      Set("6.9.9.93 1 ", "6.7.8.93 1 "))
  }

  test("deadman with expected events present does not fire (test_alerts.py:265)") {
    val spec = Shells.deadman(Map(
      "alert_name" -> "test_deadman",
      "summary" -> "Expected events are missing",
      "aggregation_key" -> "region"))
    assert(Trigger.deadman(oneloginEvent, spec).isEmpty)
  }

  test("deadman without events fires with tags and summary (test_alerts.py:267-276)") {
    val spec = Shells.deadman(Map(
      "alert_name" -> "test_deadman",
      "summary" -> "Expected events are missing",
      "aggregation_key" -> "region"))
    val alerts = Trigger.deadman(oneloginEvent.limit(0), spec).collect()
    assert(alerts.length === 1)
    assert(alerts.head.getAs[String]("summary").contains("Expected events are missing"))
    assert(alerts.head.getSeq[String](alerts.head.fieldIndex("tags")).contains("deadman"))
    val md = alerts.head.getStruct(alerts.head.fieldIndex("metadata"))
    assert(md.getAs[String]("value") === "region") // fabricated (key, 0)
    assert(md.getAs[Long]("count") === 0L)
  }

  test("deadman fires on count at-or-below threshold") {
    val spec = Shells.deadman(Map(
      "aggregation_key" -> "region", "threshold" -> 2,
      "summary" -> "only {{metadata.count}} events from {{metadata.value}}"))
    val alerts = Trigger.deadman(oneloginEvent, spec).collect()
    assert(alerts.length === 1)
    assert(alerts.head.getAs[String]("summary") === "only 1 events from us-east-1")
  }

  test("aggregation key across a JSON-string details column") {
    val events = spark.read.json(Seq(
      """{"source":"cloudtrail","eventid":"e1","details":"{\"useridentity\":{\"arn\":\"arn:x\"},\"sourceipaddress\":\"9.9.9.9\"}"}""",
      """{"source":"cloudtrail","eventid":"e2","details":"{\"useridentity\":{\"arn\":\"arn:x\"},\"sourceipaddress\":\"8.8.8.8\"}"}""").toDS)
    val spec = Shells.threshold(Map(
      "summary" -> "User {{metadata.value}} {{metadata.count}} console logins",
      "event_snippet" -> "from IP {{details.sourceipaddress}}",
      "aggregation_key" -> "details.useridentity.arn"))
    val alerts = Trigger.threshold(events, spec).collect()
    assert(alerts.length === 1)
    val summary = alerts.head.getAs[String]("summary")
    assert(summary.contains("User arn:x 2 console logins"))
    assert(summary.contains("from IP 8.8.8.8") && summary.contains("from IP 9.9.9.9"))
  }

  test("compiled template: numeric index into a JSON-string array uses [n] JSONPath") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.json(Seq(
      """{"id":1,"details":"{\"ports\":[80,443]}"}""").toDS)
    val rendered = df.select(graft.functions.Template
      .compile("p={{details.ports.1}}", df.schema).as("s")).head().getString(0)
    assert(rendered === "p=443") // pre-fix: '$.ports.1' → NULL → "p="
  }

  test("missing aggregation key path yields no groups, no alerts") {
    val spec = Shells.threshold(Map("aggregation_key" -> "no.such.path"))
    assert(Trigger.threshold(cloudtrailEvents, spec).isEmpty)
  }
}

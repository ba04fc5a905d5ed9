package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Json, Template}

class TemplateSpec extends AnyFunSuite {

  val ctx: Map[String, Any] = Map(
    "alert_name" -> "aws_console_login",
    "metadata" -> Map("value" -> "arn:aws:iam::123:root", "count" -> 3),
    "slots" -> Seq(
      Map("events" -> Seq(Map("details" -> Map("user_name" -> "jsmith")))),
      Map("alert_name" -> "slot1")),
    "details" -> """{"sourceipaddress":"6.9.9.93","risk_score":87}""")

  test("plain interpolation") {
    assert(Template.render("User {{metadata.value}} {{metadata.count}} logins", ctx) ===
      "User arn:aws:iam::123:root 3 logins")
  }

  test("numeric array indexing crosses slots and events (cross-slot refs)") {
    assert(Template.render("by {{slots.0.events.0.details.user_name}}", ctx) === "by jsmith")
  }

  test("missing path renders empty string (Mustache semantics)") {
    assert(Template.render("x{{does.not.exist}}y", ctx) === "xy")
    assert(Template.render("x{{slots.5.alert_name}}y", ctx) === "xy")
  }

  test("path descends into JSON-string values like details") {
    assert(Template.render("from {{details.sourceipaddress}}", ctx) === "from 6.9.9.93")
    assert(Template.render("score {{details.risk_score}}", ctx) === "score 87")
  }

  test("no variables / literal text passthrough") {
    assert(Template.render("plain text", ctx) === "plain text")
    assert(Template.variables("a {{b}} c {{ d.e }}") === Seq("b", "d.e"))
  }

  test("numeric index after a JSON-string hop uses JSONPath [n] form") {
    // compiled (Column) rendering must agree with driver-side rendering
    // for array indexes inside a JSON-string column
    val driver = Template.render("{{details.ports.1}}",
      Map("details" -> """{"ports":[80,443]}"""))
    assert(driver === "443")
  }

  test("json round trip") {
    val m = Json.parseMap("""{"a":{"b":[1,2,{"c":"x"}]}}""")
    assert(Template.render("{{a.b.2.c}}", m) === "x")
    assert(Json.parseMap(Json.write(m)) === m)
  }
}

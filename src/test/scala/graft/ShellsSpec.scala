package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dates
import graft.model.{AlertDoc, Shells}

class ShellsSpec extends AnyFunSuite {

  test("threshold shell defaults (alerta.py:164-184)") {
    val s = Shells.threshold(Map("alert_name" -> "test_threshold"))
    assert(AlertDoc.str(s, "alert_name") === "test_threshold")
    assert(AlertDoc.str(s, "alert_type") === "threshold")
    assert(AlertDoc.str(s, "severity") === "INFO")
    assert(AlertDoc.str(s, "summary") === "threshold alert!")
    assert(AlertDoc.int(s, "event_sample_count", -1) === 3)
    assert(AlertDoc.str(s, "category") === "general")
    assert(AlertDoc.int(s, "threshold", -1) === 1)
    assert(AlertDoc.seq(s, "events").isEmpty)
    // tz-aware timestamp, python-isoformat style
    assert(AlertDoc.str(s, "utctimestamp").contains("+00:00"))
  }

  test("deadman shell defaults differ (alerta.py:187-207)") {
    val s = Shells.deadman(Map())
    assert(AlertDoc.str(s, "alert_name") === "unnamed")
    assert(AlertDoc.int(s, "event_sample_count", -1) === 0)
    assert(AlertDoc.int(s, "threshold", -1) === 0)
    assert(AlertDoc.str(s, "category") === "deadman")
    assert(AlertDoc.seq(s, "tags") === Seq("deadman"))
    assert(AlertDoc.str(s, "aggregation_key") === "none")
  }

  test("override wins over defaults; extra keys survive the merge") {
    val s = Shells.threshold(Map(
      "severity" -> "CRITICAL", "threshold" -> 5, "custom_field" -> "kept"))
    assert(AlertDoc.str(s, "severity") === "CRITICAL")
    assert(AlertDoc.int(s, "threshold", -1) === 5)
    assert(AlertDoc.str(s, "custom_field") === "kept")
  }

  test("shell always resets events (merge overlay semantics)") {
    val s = Shells.threshold(Map("events" -> Seq(Map("eventid" -> "x"))))
    assert(AlertDoc.seq(s, "events").isEmpty)
  }

  test("sequence shell: lifespan default + expiration computed") {
    val now = Instant.parse("2026-08-12T00:00:00Z")
    val s = Shells.sequence(Map("alert_name" -> "seq"), now)
    assert(AlertDoc.str(s, "lifespan") === "3 days")
    assert(Dates.toUTC(AlertDoc.str(s, "expiration")) ===
      Instant.parse("2026-08-15T00:00:00Z"))
    // explicit utctimestamp is honored (alerta.py:258)
    val s2 = Shells.sequence(Map("utctimestamp" -> "2026-01-01T00:00:00+00:00",
      "lifespan" -> "1 hour"), now)
    assert(Dates.toUTC(AlertDoc.str(s2, "expiration")) ===
      Instant.parse("2026-01-01T01:00:00Z"))
  }

  test("deep merge: nested maps merge, overlay scalars win") {
    val m = AlertDoc.merge(
      Map("a" -> Map("x" -> 1, "y" -> 2), "b" -> 1),
      Map("a" -> Map("y" -> 3, "z" -> 4), "c" -> 5))
    assert(m("a") === Map("x" -> 1, "y" -> 3, "z" -> 4))
    assert(m("b") === 1 && m("c") === 5)
  }
}

class DatesSpec extends AnyFunSuite {

  test("epoch magnitude detection: s / ms / µs / ns (utils/dates.py:58-62)") {
    val want = Instant.parse("2024-01-01T00:16:06Z")
    assert(Dates.toUTC(1704068166L) === want)
    assert(Dates.toUTC("1704068166") === want)
    assert(Dates.toUTC(1704068166000L) === want)
    assert(Dates.toUTC(1704068166000000L) === want)
    assert(Dates.toUTC(1704068166000000000L) === want)
  }

  test("non-positive clamps to epoch (utils/dates.py:44-45)") {
    assert(Dates.toUTC(0L) === Instant.EPOCH)
    assert(Dates.toUTC(-5L) === Instant.EPOCH)
    assert(Dates.toUTC("-12.5") === Instant.EPOCH)
  }

  test("float epoch with fraction") {
    assert(Dates.toUTC(1704068166.5) === Instant.parse("2024-01-01T00:16:06.500Z"))
  }

  test("space-separated timestamps accept any fractional precision") {
    assert(Dates.toUTC("2026-08-12 05:00:00.123") ===
      Instant.parse("2026-08-12T05:00:00.123Z"))
    assert(Dates.toUTC("2026-08-12 05:00:00.123456789") ===
      Instant.parse("2026-08-12T05:00:00.123456789Z"))
  }

  test("ISO strings with and without offset; naive assumed UTC") {
    assert(Dates.toUTC("2024-01-01T00:16:06+00:00") === Instant.parse("2024-01-01T00:16:06Z"))
    assert(Dates.toUTC("2024-01-01T02:16:06+02:00") === Instant.parse("2024-01-01T00:16:06Z"))
    assert(Dates.toUTC("2024-01-01T00:16:06") === Instant.parse("2024-01-01T00:16:06Z"))
    assert(Dates.toUTC("2024-01-01 00:16:06") === Instant.parse("2024-01-01T00:16:06Z"))
    assert(Dates.toUTC("2024-01-01") === Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("interval parser covers the corpus forms (T6)") {
    assert(Dates.interval("3 days").toDays === 3)
    assert(Dates.interval("1 day").toDays === 1)
    assert(Dates.interval("1 hour").toHours === 1)
    assert(Dates.interval("7 days").toDays === 7)
    assert(Dates.interval("45 minutes").toMinutes === 45)
    assert(Dates.interval("2 weeks").toDays === 14)
    // ms is milliseconds (pandas Timedelta), never 500 minutes
    assert(Dates.interval("500 ms").toMillis === 500)
    assert(Dates.interval("250 milliseconds").toMillis === 250)
    assert(Dates.interval("5 m").toMinutes === 5)
    assert(Dates.interval("5 mins").toMinutes === 5)
  }

  test("fuzzy free-text dates parse (utils/dates.py:73, dateutil fuzzy=True)") {
    // month-name forms, with and without surrounding prose
    assert(Dates.toUTC("Jan 5 2024 13:00") === Instant.parse("2024-01-05T13:00:00Z"))
    assert(Dates.toUTC("January 5th, 2024 at 1:00:05 pm UTC") ===
      Instant.parse("2024-01-05T13:00:05Z"))
    assert(Dates.toUTC("alert fired on 5 Feb 2024") === Instant.parse("2024-02-05T00:00:00Z"))
    // embedded ISO-ish date + time + explicit offset inside free text
    assert(Dates.toUTC("seen 2024-01-05 at 13:00 -05:00 by probe") ===
      Instant.parse("2024-01-05T18:00:00Z"))
    // US slash date (dateutil month-first convention)
    assert(Dates.toUTC("12/25/2023 08:30") === Instant.parse("2023-12-25T08:30:00Z"))
    // 12 am/pm edge cases
    assert(Dates.toUTC("Dec 31 2023 12:00 am") === Instant.parse("2023-12-31T00:00:00Z"))
    assert(Dates.toUTC("Dec 31 2023 12:00 pm") === Instant.parse("2023-12-31T12:00:00Z"))
    // mixed-precision fraction in fuzzy context
    assert(Dates.toUTC("Mar 3 2021 04:05:06.123") ===
      Instant.parse("2021-03-03T04:05:06.123Z"))
    // trailing/leading whitespace never breaks the exact ladder
    assert(Dates.toUTC(" 2024-01-05T13:00Z ") === Instant.parse("2024-01-05T13:00:00Z"))
    // full month names, including the sept 4-letter abbreviation
    assert(Dates.toUTC("September 2nd 2024") === Instant.parse("2024-09-02T00:00:00Z"))
    // explicit offset WITHOUT a time of day: the offset digits must
    // not double as the time (midnight at -05:00, not 05:00 local)
    assert(Dates.toUTC("seen 2024-01-05 -05:00 by probe") ===
      Instant.parse("2024-01-05T05:00:00Z"))
    // zero-hour negative offset keeps its sign
    assert(Dates.toUTC("2024-01-05 08:00 -00:30") ===
      Instant.parse("2024-01-05T08:30:00Z"))
    // colon-less offset only counts directly after a time of day or a
    // zulu/UTC marker: a hyphenated digit run in prose is NOT an offset
    // (this used to read "-1234" as -12:34 and shift the instant)
    assert(Dates.toUTC("Jan 5 2024 13:00 ref 555-1234") ===
      Instant.parse("2024-01-05T13:00:00Z"))
    assert(Dates.toUTC("2024-01-05 13:00-0500") ===
      Instant.parse("2024-01-05T18:00:00Z"))
    assert(Dates.toUTC("Jan 5 2024 13:00 utc +0200 case 555-1234") ===
      Instant.parse("2024-01-05T11:00:00Z"))
    // bare offset after a 12-hour time: the am/pm marker is part of
    // the time, so "-0500" is still a directly-following offset (and
    // its digits must never be harvested as a 4-digit year)
    assert(Dates.toUTC("Jan 5 2024 1:30 pm -0500") ===
      Instant.parse("2024-01-05T18:30:00Z"))
    assert(Dates.toUTC("1:30 pm -0500 Jan 5 2024") ===
      Instant.parse("2024-01-05T18:30:00Z"))
    // month-name PREFIXES inside ordinary words are not date evidence
    intercept[IllegalArgumentException](Dates.toUTC("novel 2024 error after 3 retries"))
    intercept[IllegalArgumentException](Dates.toUTC("decode failed 7 times in 2023"))
    // no date evidence still fails loudly
    intercept[IllegalArgumentException](Dates.toUTC("not a date at all"))
  }

  test("toUTC digit-length quirk is reference parity (utils/dates.py:59)") {
    // the reference divides DIGIT-STRING epochs by 10^(len % 10): a
    // 9-digit epoch-seconds value collapses toward 1970 on the digit
    // path, while the SAME value as a float uses log10 magnitude and
    // parses correctly. Faithful parity, quirk included — pin both.
    assert(Dates.toUTC("946684800") ===
      java.time.Instant.ofEpochSecond(0, 946684800L))
    assert(Dates.toUTC(946684800.0) ===
      java.time.Instant.parse("2000-01-01T00:00:00Z"))
    // 10-digit seconds and 13-digit millis both scale correctly
    assert(Dates.toUTC("1704067200") === java.time.Instant.parse("2024-01-01T00:00:00Z"))
    assert(Dates.toUTC("1704067200000") === java.time.Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("dictMatch projects onto the query's top-level keys (nested maps work)") {
    val target: graft.model.AlertDoc.Doc =
      Map("details" -> Map("x" -> 1), "other" -> 2)
    assert(AlertDoc.dictMatch(Map("details" -> Map("x" -> 1)), target))
    assert(!AlertDoc.dictMatch(Map("details" -> Map("x" -> 9)), target))
  }
}

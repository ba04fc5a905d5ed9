package graft.functions

import java.time.{Duration, Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.util.Try

/** Timestamp coercion and interval parsing.
  *
  * `toUTC` ports the reference's permissive decision ladder
  * (utils/dates.py:38-85): datetimes pass through; non-positive epochs
  * clamp to 1970-01-01; numeric epochs auto-detect seconds /
  * milliseconds / microseconds / nanoseconds by digit magnitude;
  * strings try numeric first, then ISO-ish parsing, then the fuzzy
  * free-text scan (`dateutil.parse(..., fuzzy=True)` at
  * utils/dates.py:73 — see [[Dates#fuzzyParse]]). The engine pins its
  * session timezone to UTC, so the reference's "naive → local tz"
  * step degenerates to "naive → UTC".
  */
object Dates {

  val Epoch: Instant = Instant.EPOCH

  def utcnow(): Instant = Instant.now()

  def iso(t: Instant): String =
    // match python isoformat with offset: 2026-08-12T05:00:00+00:00
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx")
      .withZone(ZoneOffset.UTC).format(t)

  /** Epoch-magnitude scaling: a positive count of digits picks the
    * unit the way utils/dates.py:47-52 and :58-62 do (seconds have 10
    * digits until 2286; 13 = ms, 16 = µs, 19 = ns).
    */
  private def fromEpochDigits(digits: String): Instant = {
    val divisorPow = digits.length % 10 // 10→0, 13→3, 16→6, 19→9
    val seconds = BigDecimal(digits) / BigDecimal(10).pow(divisorPow)
    fromEpochSeconds(seconds)
  }

  private def fromEpochSeconds(s: BigDecimal): Instant = {
    val secs = s.setScale(9, BigDecimal.RoundingMode.FLOOR)
    val whole = secs.toBigInt.toLong
    val nanos = ((secs - BigDecimal(whole)) * 1000000000L).toLong
    Instant.ofEpochSecond(whole, nanos)
  }

  private def fromDouble(d: Double): Instant =
    if (d <= 0) Epoch
    else {
      val magnitude = math.log10(d.toLong.toDouble).toInt
      val scaled = if (magnitude > 9) d / math.pow(10, magnitude - 9) else d
      fromEpochSeconds(BigDecimal(scaled))
    }

  private val patterns = Seq(
    DateTimeFormatter.ISO_OFFSET_DATE_TIME,
    DateTimeFormatter.ISO_INSTANT,
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ssXXX"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm:ssXXX"))
  // space-separated forms accept 0-9 fractional digits (a fixed
  // "SSSSSS" pattern would reject common millisecond-precision strings)
  private def spaceSeparated(datePattern: String): DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(datePattern + " HH:mm:ss")
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 0, 9, true)
      .optionalEnd()
      .toFormatter()

  private val naivePatterns = Seq(
    DateTimeFormatter.ISO_LOCAL_DATE_TIME,
    spaceSeparated("yyyy-MM-dd"),
    spaceSeparated("yyyy/MM/dd"))

  def toUTC(suspected: Any): Instant = suspected match {
    case i: Instant            => i
    case t: java.sql.Timestamp => t.toInstant
    case d: java.util.Date     => d.toInstant
    case l: Long               => if (l <= 0) Epoch else fromEpochDigits(l.toString)
    case i: Int                => if (i <= 0) Epoch else fromEpochDigits(i.toString)
    case d: Double             => fromDouble(d)
    case f: Float              => fromDouble(f.toDouble)
    case s: String             => parseString(s.trim)
    case other =>
      throw new IllegalArgumentException(s"Unable to convert $other to a date")
  }

  private def parseString(s: String): Instant =
    if (s.nonEmpty && s.forall(_.isDigit)) fromEpochDigits(s)
    else Try(s.toDouble).toOption match {
      case Some(d) if d <= 0 => Epoch
      case Some(d)           => fromDouble(d)
      case None =>
        patterns.view.flatMap(p => Try(OffsetDateTime.parse(s, p).toInstant).toOption)
          .headOption
          .orElse(naivePatterns.view.flatMap(p =>
            Try(LocalDateTime.parse(s, p).toInstant(ZoneOffset.UTC)).toOption).headOption)
          .orElse(Try(LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)).toOption)
          .orElse(fuzzyParse(s))
          .getOrElse(throw new IllegalArgumentException(s"Unable to convert '$s' to a date"))
    }

  private val monthNames = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)
  private val fuzzyIsoDate = raw"\b(\d{4})[-/](\d{1,2})[-/](\d{1,2})\b".r
  private val fuzzyUsDate = raw"\b(\d{1,2})/(\d{1,2})/(\d{4})\b".r
  // whole tokens only (dateutil parity): "novel"/"decode"/"marginal"
  // must NOT read as month evidence — full names first so the
  // alternation can't stop at a bare prefix
  private val fuzzyMonth =
    raw"\b(january|february|march|april|may|june|july|august|september|october|november|december|jan|feb|mar|apr|jun|jul|aug|sept|sep|oct|nov|dec)\b".r
  private val fuzzyTime = raw"\b(\d{1,2}):(\d{2})(?::(\d{2})(\.\d{1,9})?)?\s*(am|pm)?\b".r
  // sign captured separately: "-00:30"'s hour field parses to 0, so a
  // sign folded into the hour int would vanish for zero-hour offsets.
  // The colon form is timezone evidence anywhere; the colon-less form
  // only directly after a time of day or a zulu/UTC marker — otherwise
  // a hyphenated digit run in free text ("ref 555-1234") would read as
  // a -12:34 offset and silently shift the instant by hours
  private val fuzzyOffsetColon = raw"([+-])(\d{2}):(\d{2})\b".r
  // the time alternative admits an optional am/pm marker: "1:30 pm
  // -0500" is as explicit a time-then-offset as "13:30 -0500", and
  // without it the offset is silently dropped (worse, its digits can
  // be harvested as a 4-digit year once the time is consumed)
  private val fuzzyOffsetBare =
    raw"((?:\d{1,2}:\d{2}(?::\d{2}(?:\.\d{1,9})?)?(?:\s*(?:am|pm))?|\b(?:z|utc|gmt))\s*)([+-])(\d{2})(\d{2})\b".r

  /** Fuzzy free-text fallback — the `dateutil.parse(..., fuzzy=True)`
    * step of the reference ladder (utils/dates.py:73): scan the string
    * for date evidence, ignoring unknown tokens. Accepted evidence:
    * an ISO-ish `yyyy-mm-dd` / `yyyy/mm/dd` or US `m/d/yyyy` date, or
    * a month name with a nearby day and 4-digit year ("Jan 5 2024",
    * "January 5th, 2024"); plus an optional `hh:mm[:ss[.frac]]` time
    * with am/pm and an optional explicit `±hh:mm` offset (`±hhmm`
    * accepted only directly after the time or a Z/UTC/GMT marker;
    * absent or
    * textual UTC/GMT/Z markers mean UTC — the session pins UTC, so the
    * reference's "naive → local tz" step degenerates the same way).
    * Deterministic subset of dateutil: a full year+month+day is
    * required (dateutil's "default missing fields to today" is
    * nondeterministic; the corpus' cursed timestamps always carry a
    * date); missing time means midnight.
    */
  private def fuzzyParse(s: String): Option[Instant] = {
    val lower = s.toLowerCase
    // an explicit ±hh[:]mm offset is extracted from the raw text, then
    // STRIPPED before time/day/year harvesting — its digits would
    // otherwise double as a time of day ("2024-01-05 -05:00" is
    // midnight at -05:00, not 05:00)
    val noOff = fuzzyOffsetBare.replaceAllIn(
      fuzzyOffsetColon.replaceAllIn(lower, " "), "$1 ")
    val datePart: Option[(Int, Int, Int)] =
      fuzzyIsoDate.findFirstMatchIn(noOff)
        .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))
        .orElse(fuzzyUsDate.findFirstMatchIn(noOff)
          .map(m => (m.group(3).toInt, m.group(1).toInt, m.group(2).toInt)))
        .orElse {
          // month-name form: strip the time of day first so its digits
          // can't be mistaken for a day or year
          val noTime = fuzzyTime.replaceAllIn(noOff, " ")
          fuzzyMonth.findFirstMatchIn(noTime).flatMap { mm =>
            val month = monthNames(mm.group(1).take(3))
            val nums = raw"\b(\d{1,4})(?:st|nd|rd|th)?\b".r
              .findAllMatchIn(noTime).map(_.group(1)).toList
            val year = nums.find(_.length == 4).map(_.toInt)
            val day = nums.filter(_.length < 4).map(_.toInt).find(d => d >= 1 && d <= 31)
            year.zip(day).map { case (y, d) => (y, month, d) }
          }
        }
    datePart.flatMap { case (y, mo, d) =>
      val (hh, mi, ss, nanos) = fuzzyTime.findFirstMatchIn(noOff) match {
        case Some(t) =>
          val ampm = Option(t.group(5))
          val h0 = t.group(1).toInt
          val h = if (ampm.contains("pm") && h0 != 12) h0 + 12
                  else if (ampm.contains("am") && h0 == 12) 0
                  else h0
          val frac = Option(t.group(4))
            .map(f => (BigDecimal(f) * 1000000000L).toLong).getOrElse(0L)
          (h, t.group(2).toInt, Option(t.group(3)).map(_.toInt).getOrElse(0), frac)
        case None => (0, 0, 0, 0L)
      }
      val off = fuzzyOffsetColon.findFirstMatchIn(lower)
        .map(m => (m.group(1), m.group(2), m.group(3)))
        .orElse(fuzzyOffsetBare.findFirstMatchIn(lower)
          .map(m => (m.group(2), m.group(3), m.group(4))))
        .flatMap { case (sg, oh, om) =>
          val sign = if (sg == "-") -1 else 1
          Try(ZoneOffset.ofHoursMinutes(sign * oh.toInt, sign * om.toInt)).toOption
        }
        .getOrElse(ZoneOffset.UTC)
      Try(LocalDateTime.of(y, mo, d, hh, mi, ss, nanos.toInt)
        .atOffset(off).toInstant).toOption
    }
  }

  /** Human-interval parser for `lifespan` strings ("3 days", "1 hour",
    * "45 minutes", "2 weeks") — the pandas `Timedelta` subset the
    * reference corpus uses (alerta.py:266, SURVEY.md §2.6 T6).
    */
  def interval(lifespan: String): Duration = {
    val rx = raw"(?i)\s*(\d+)\s*(week|day|hour|minute|millisecond|milli|ms|min|second|sec|w|d|h|m|s)s?\s*".r
    lifespan.trim match {
      case rx(n, unit) =>
        val v = n.toLong
        unit.toLowerCase match {
          case "week" | "w"                  => Duration.ofDays(7 * v)
          case "day" | "d"                   => Duration.ofDays(v)
          case "hour" | "h"                  => Duration.ofHours(v)
          case "minute" | "min" | "m"        => Duration.ofMinutes(v)
          case "second" | "sec" | "s"        => Duration.ofSeconds(v)
          case "millisecond" | "milli" | "ms" => Duration.ofMillis(v)
        }
      case other =>
        throw new IllegalArgumentException(s"Unparseable lifespan: '$other'")
    }
  }
}

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
  * strings try numeric first, then ISO-ish parsing. The engine pins
  * its session timezone to UTC, so the reference's "naive → local tz"
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
          .getOrElse(throw new IllegalArgumentException(s"Unable to convert '$s' to a date"))
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

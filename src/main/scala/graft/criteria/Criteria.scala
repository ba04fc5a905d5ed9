package graft.criteria

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The alert `criteria` dialect shim.
  *
  * Alert authors write criteria as Presto/Athena SQL boolean predicate
  * text (reference: alerta.py:135 injects it verbatim into the WHERE
  * clause). Spark SQL parses almost all of it natively; the only
  * Presto-ism in the shipped alert corpus is `json_extract_scalar`,
  * which Spark spells `get_json_object` (same JSONPath semantics for
  * scalar extraction, NULL on miss). We rewrite token-wise rather than
  * registering an alias so the criteria text stays valid for
  * `EXPLAIN`/debug output and for the DuckDB oracle rewrite in tests.
  */
object Criteria {

  /** Presto → Spark SQL dialect rewrite for alert criteria text.
    * Reference construct inventory: SURVEY.md §2.2. Rewrites apply
    * only OUTSIDE single-quoted SQL string literals — a criteria
    * comparing against text that happens to contain a function name
    * must not have its literal rewritten.
    */
  def rewrite(presto: String): String = {
    // Presto date_diff('unit', t1, t2) → Spark timestampdiff(unit, ...):
    // Spark's parser special-cases the unit as an unquoted keyword, so
    // this must run on the whole text (the unit IS a string literal) —
    // before the literal-preserving pass below. Same t2-t1 direction.
    val units =
      "year|quarter|month|week|day|hour|minute|second|millisecond|microsecond"
    val unitFixed = presto
      .replaceAll(s"(?i)\\bdate_diff\\(\\s*'($units)'\\s*,",
        "timestampdiff($1,")
      // Presto date_add('unit', n, ts) — same parser-claimed shape
      .replaceAll(s"(?i)\\bdate_add\\(\\s*'($units)'\\s*,",
        "timestampadd($1,")
    // split into alternating [code, 'literal', code, ...] chunks;
    // '' inside a literal is the SQL escape for a quote
    val literal = "'(?:[^']|'')*'".r
    val sb = new StringBuilder
    var last = 0
    for (m <- literal.findAllMatchIn(unitFixed)) {
      sb.append(rewriteCode(unitFixed.substring(last, m.start)))
      sb.append(m.matched) // literal untouched
      last = m.end
    }
    sb.append(rewriteCode(unitFixed.substring(last)))
    sb.toString
  }

  private def rewriteCode(code: String): String =
    code
      .replaceAll("(?i)\\bjson_extract_scalar\\b", "get_json_object")
      .replaceAll("(?i)\\bTRY_CAST\\b", "try_cast")

  /** Parse rewritten criteria into a Column predicate. Catalyst then
    * pushes whatever it can into the scan (envelope-column equality
    * predicates reach the parquet reader; JSON extraction evaluates
    * post-scan, exactly as Presto does).
    *
    * Blank criteria (the shell default when an author omits it) means
    * "everything" — the same contract the streaming paths document —
    * instead of an expr("") ParseException that would silently skip
    * the spec in batch.
    */
  def toColumn(presto: String): Column =
    if (presto.trim.isEmpty) lit(true) else expr(rewrite(presto))

  def apply(df: DataFrame, presto: String): DataFrame = df.where(toColumn(presto))

  // --- partition window ---------------------------------------------------

  private val yearF  = DateTimeFormatter.ofPattern("yyyy").withZone(ZoneOffset.UTC)
  private val monthF = DateTimeFormatter.ofPattern("MM").withZone(ZoneOffset.UTC)
  private val dayF   = DateTimeFormatter.ofPattern("dd").withZone(ZoneOffset.UTC)
  private val hourF  = DateTimeFormatter.ofPattern("HH").withZone(ZoneOffset.UTC)

  /** The reference scans the current + previous hour partitions via
    * zero-padded string equality predicates on `year/month/day/hour`
    * (alerta.py:136-146, utils/dates.py:13-35). Filters on parquet
    * partition columns prune automatically in Spark — at 100 TB this
    * is the difference between scanning 2 hours and 3 years of data.
    */
  def partitionWindow(now: Instant): Column = {
    def hourPredicate(t: Instant): Column =
      col("year") === yearF.format(t) &&
        col("month") === monthF.format(t) &&
        col("day") === dayF.format(t) &&
        col("hour") === hourF.format(t)
    hourPredicate(now) || hourPredicate(now.minusSeconds(3600))
  }

  /** Same two-hour lookback expressed directly against an event-time
    * column — for sources that are not hour-partitioned (e.g. the
    * local `events.parquet`, which has a raw `ts`). Semantically the
    * partition predicates truncate to hour boundaries, so the window
    * is [hourStart(now)-1h, now..end-of-hour]; we reproduce that by
    * comparing on the hour-truncated timestamp.
    */
  def timeWindow(tsCol: Column, now: Instant): Column = {
    val nowTs = lit(DateTimeFormatter.ISO_INSTANT.format(now)).cast("timestamp")
    date_trunc("hour", tsCol) === date_trunc("hour", nowTs) ||
      date_trunc("hour", tsCol) === date_trunc("hour", nowTs - expr("INTERVAL 1 HOUR"))
  }

  /** Derive the reference's zero-padded string partition columns from a
    * timestamp — used when materializing an events lake laid out
    * `year=/month=/day=/hour=` for parity with the reference's Athena
    * table (alerta.py:136-146).
    */
  def withPartitionColumns(df: DataFrame, tsCol: Column): DataFrame =
    df.withColumn("year", date_format(tsCol, "yyyy"))
      .withColumn("month", date_format(tsCol, "MM"))
      .withColumn("day", date_format(tsCol, "dd"))
      .withColumn("hour", date_format(tsCol, "HH"))
}

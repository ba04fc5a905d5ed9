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
    val subFixed = rewriteSubscripts(rewriteQuotedIdents(unitFixed))
    val literal = "'(?:[^']|'')*'".r
    val sb = new StringBuilder
    var last = 0
    for (m <- literal.findAllMatchIn(subFixed)) {
      sb.append(rewriteCode(subFixed.substring(last, m.start)))
      sb.append(m.matched) // literal untouched
      last = m.end
    }
    sb.append(rewriteCode(subFixed.substring(last)))
    sb.toString
  }

  /** The dialect shims that would shadow a Spark builtin are
    * registered as `presto_<name>` (the no-shadow invariant,
    * [[graft.functions.Functions.prefixedNames]]); criteria text
    * keeps the bare Presto spelling and this token pass maps it.
    * Single source of truth: the regex is BUILT from Functions'
    * set, so a new prefixed shim can never drift out of sync.
    * Function-call position only (`(?=\s*\()`) — a column that
    * happens to be named `split` is not a call and stays untouched.
    * The leading `(?<![\w.])` (NOT a bare \b, which matches after
    * '.') keeps qualified references like `cat.split(...)` intact:
    * a dotted prefix means the call resolves through a qualifier,
    * never the session temp registry, so rewriting it would mangle
    * the name for nothing.
    */
  private val prefixedCall =
    ("(?i)(?<![\\w.])(" + graft.functions.Functions.prefixedNames.toSeq.sorted
      .mkString("|") + ")\\b(?=\\s*\\()")

  private def rewriteCode(code: String): String =
    code
      .replaceAll("(?i)(?<![\\w.])json_extract_scalar\\b", "get_json_object")
      .replaceAll("(?i)(?<![\\w.])TRY_CAST\\b", "try_cast")
      .replaceAll(prefixedCall, "presto_$1")
      // Presto's bare unparameterized VARCHAR (CAST(x AS VARCHAR)) —
      // Spark requires a length for VARCHAR but takes STRING;
      // VARCHAR(n) is valid in both and stays untouched
      .replaceAll("(?i)\\bVARCHAR\\b(?!\\s*\\()", "STRING")

  /** Presto double-quoted identifiers → Spark backtick-quoted
    * (`"a b"` → `` `a b` ``). Presto string literals are always
    * single-quoted, so outside single-quoted literals a double-quoted
    * token is ALWAYS an identifier — while Spark (with ANSI
    * double-quoted-identifiers off) would read it as a string literal
    * and silently compare against the wrong thing. `""` inside is
    * Presto's escape for one quote; a literal backtick inside the
    * identifier becomes Spark's doubled-backtick escape.
    */
  private[graft] def rewriteQuotedIdents(s: String): String = {
    // One left-to-right pass over BOTH quote kinds: whichever quote
    // opens first owns its span. (Pre-extracting single-quoted spans
    // first mis-chunked a double-quoted identifier containing an
    // apostrophe — "it's col" — by pairing the apostrophe with a
    // later real string literal.)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          // single-quoted literal: copy verbatim; '' is the escape
          var j = i + 1
          var closed = false
          while (j < s.length && !closed) {
            if (s.charAt(j) == '\'') {
              if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
              else { closed = true; j += 1 }
            } else j += 1
          }
          sb.append(s.substring(i, j)); i = j
        case '"' =>
          // double-quoted identifier → backtick-quoted; "" escapes a
          // quote, a literal backtick doubles per Spark's escape
          var j = i + 1
          val ident = new StringBuilder
          var closed = false
          while (j < s.length && !closed) {
            if (s.charAt(j) == '"') {
              if (j + 1 < s.length && s.charAt(j + 1) == '"') {
                ident.append('"'); j += 2
              } else { closed = true; j += 1 }
            } else { ident.append(s.charAt(j)); j += 1 }
          }
          if (closed)
            sb.append('`').append(ident.toString.replace("`", "``"))
              .append('`')
          else sb.append(s.substring(i, j)) // unterminated: verbatim
          i = j
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Presto `expr[i]` subscripts are 1-BASED on arrays; Spark's `[]`
    * is 0-based — a wild criteria using `split(x, ',')[1]` would
    * silently read the WRONG element. Rewrite every subscript to
    * `element_at(expr, i)`, which carries Presto's semantics in Spark
    * for both arrays (1-based, negative-from-end) and maps (key
    * lookup). `ARRAY[...]` constructors become Spark's `array(...)`.
    * (Divergence kept: Presto errors on an out-of-range array index,
    * element_at returns NULL — lax, never wrong-element.)
    *
    * Innermost-first, literal-aware, fixpoint loop: each pass rewrites
    * one bracket pair whose content holds no further brackets, so
    * `a[b[1]]` and chained `m[1][2]` both resolve. A bracket pair
    * whose base is unrecognizable (a stray bracket, a non-subscript
    * construct) is SKIPPED — the scan resumes after it so every later
    * rewritable subscript in the same criteria still converts, instead
    * of being silently left as a 0-based Spark subscript. Backtick-
    * quoted bases (from [[rewriteQuotedIdents]]) are valid subscript
    * bases.
    */
  private[graft] def rewriteSubscripts(s: String): String =
    rewriteSubscriptsFrom(s, 0)

  @annotation.tailrec
  private def rewriteSubscriptsFrom(s: String, from: Int): String = {
    val spans = "'(?:[^']|'')*'".r.findAllMatchIn(s)
      .map(m => (m.start, m.end)).toSeq
    def inLiteral(i: Int) = spans.exists(sp => i >= sp._1 && i < sp._2)
    // innermost pair at-or-after `from` = the last '[' before the
    // first ']' (both outside literals); its content is bracket-free
    // by construction
    var open = -1; var close = -1; var i = math.max(from, 0)
    while (i < s.length && close < 0) {
      if (!inLiteral(i)) {
        if (s.charAt(i) == '[') open = i
        else if (s.charAt(i) == ']' && open >= 0) close = i
      }
      i += 1
    }
    if (close < 0) s
    else {
      val inner = s.substring(open + 1, close)
      var j = open - 1
      while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
      def identChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '.'
      val baseStart: Int =
        if (j < 0) -1
        else if (s.charAt(j) == ')') {
          // balance parens backward (literal-aware), then take the
          // function name in front
          var depth = 0; var k = j; var stop = -1
          while (k >= 0 && stop < 0) {
            if (!inLiteral(k)) {
              if (s.charAt(k) == ')') depth += 1
              else if (s.charAt(k) == '(') { depth -= 1; if (depth == 0) stop = k }
            }
            k -= 1
          }
          if (stop < 0) -1
          else {
            var m = stop - 1
            while (m >= 0 && identChar(s.charAt(m))) m -= 1
            m + 1
          }
        } else if (s.charAt(j) == '`') {
          // backtick-quoted identifier base (rewriteQuotedIdents
          // output): scan to the opening backtick
          var k = j - 1
          while (k >= 0 && s.charAt(k) != '`') k -= 1
          if (k < 0) -1 else k
        } else if (identChar(s.charAt(j))) {
          var k = j
          while (k >= 0 && identChar(s.charAt(k))) k -= 1
          k + 1
        } else -1
      if (baseStart < 0)
        // stray bracket — not a subscript. Skip past this pair and
        // keep rewriting the rest of the string.
        rewriteSubscriptsFrom(s, close + 1)
      else {
        val base = s.substring(baseStart, j + 1)
        val replaced =
          if (base.equalsIgnoreCase("array")) s"array($inner)"
          else s"element_at($base, $inner)"
        rewriteSubscriptsFrom(
          s.substring(0, baseStart) + replaced + s.substring(close + 1), 0)
      }
    }
  }

  /** Parse rewritten criteria into a Column predicate. Catalyst then
    * pushes whatever it can into the scan (envelope-column equality
    * predicates reach the parquet reader; JSON extraction evaluates
    * post-scan, exactly as Presto does).
    *
    * Blank criteria (the shell default when an author omits it) means
    * "everything" — the same contract the streaming paths document —
    * instead of an expr("") ParseException that would silently skip
    * the spec in batch.
    *
    * Register precondition: [[rewrite]] maps divergent dialect tokens
    * to `presto_<name>` functions that exist only after
    * [[graft.functions.Functions.register]] ran on the session. The
    * engine entry points all register up front; for ad-hoc callers
    * compiling criteria on a bare session, toColumn registers on the
    * active session defensively (idempotent — registration is
    * createOrReplace of the same builders).
    */
  def toColumn(presto: String): Column =
    if (presto.trim.isEmpty) lit(true)
    else {
      org.apache.spark.sql.SparkSession.getActiveSession
        .foreach(graft.functions.Functions.register)
      expr(rewrite(presto))
    }

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
    *
    * Registry-immune by construction: the `DateFormatClass` nodes are
    * built directly rather than resolved by NAME, so even a session
    * whose `FunctionRegistry` carries a foreign `date_format` (on
    * Spark 4 the DataFrame DSL resolves through the registry — the r7
    * `hour='HH'` lake-poisoning class) still writes the reference
    * layout. Defense in depth on top of the no-shadow invariant in
    * [[graft.functions.Functions.register]].
    */
  def withPartitionColumns(df: DataFrame, tsCol: Column): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{DateFormatClass, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    def fmt(pattern: String): Column = ColumnBridge.column(
      DateFormatClass(ColumnBridge.expression(tsCol), Literal(pattern)))
    df.withColumn("year", fmt("yyyy"))
      .withColumn("month", fmt("MM"))
      .withColumn("day", fmt("dd"))
      .withColumn("hour", fmt("HH"))
  }
}

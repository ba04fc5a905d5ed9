package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for URL canonicalization — the per-URL
  * hot path of the entire crawl stack (url-keyed dedup, gates,
  * frontier scheduling, the streaming crawl loop).
  *
  * The original implementation was a pure column program
  * ([[graft.ops.Curation.canonicalUrlColumnar]]): regexp_extract +
  * array HOFs. Correct, but two structural costs at scale:
  *   1. the percent-normalize subprogram (`split` on a lookahead +
  *      `transform` + `array_join`) is an interpreted CodegenFallback
  *      HOF, and
  *   2. the normalized string `u` is referenced ~8 times by the
  *      downstream scheme/host/path/query extracts, and Spark's
  *      interpreted projection does NOT share common subexpressions
  *      across those references — the plan inlines the whole decode
  *      program once PER REFERENCE, so each row paid the decode ~8×.
  * This expression evaluates the identical semantics in ONE pass of a
  * tight JVM kernel and stays inside whole-stage codegen
  * (`defineCodeGen`-style static call), so the canonicalizer rides the
  * scan map-only with one decode per row.
  *
  * Semantics are BIT-EXACT with the column program (differentially
  * pinned by CanonicalUrlProps + CurationSpec):
  *   - fragment dropped FIRST (prefix before the first `#`)
  *   - RFC 3986 §6.2.2 percent-normalization: unreserved escapes
  *     decode (`%41`→`A`, `%7e`→`~`), surviving escapes uppercase
  *     their hex, malformed escapes pass through verbatim
  *   - scheme/host lowercase (Spark `lower` = `UTF8String
  *     .toLowerCase` parity), default port stripped (`:443` https,
  *     `:80` http)
  *   - tracking params dropped by the regex (`rlike` find()
  *     semantics), survivors sorted BINARY (UTF8String order, matching
  *     `array_sort`), empty query drops its `?`
  *   - empty path becomes `/`; malformed input degrades exactly like
  *     the failed `regexp_extract`s did (empty captures, path `/`)
  * Inputs containing line-terminator characters take a slow path that
  * literally re-evaluates the column program's regexes (Java `$` /
  * dot-excludes-terminators subtleties), so exactness holds even on
  * pathological bytes.
  *
  * Reference: canonical-key pre-pass of crawl dedup pipelines
  * (CommonCrawl/FineWeb convention); RFC 3986 §6.
  */
object UrlKernels {

  /** Default-port suffixes, mirrors regexp_replace(":443$"/":80$"). */
  private def stripDefaultPort(host: String, scheme: String): String =
    if (scheme == "https" && host.endsWith(":443"))
      host.substring(0, host.length - 4)
    else if (scheme == "http" && host.endsWith(":80"))
      host.substring(0, host.length - 3)
    else host

  /** Spark `lower` parity: UTF8String.toLowerCase, not Java Locale
    * lowering (identical on ASCII, and identical by construction on
    * anything else because this IS the kernel Spark's lower calls).
    */
  private def lowerLikeSpark(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c & 0x1f) + 9
  @inline private def upperHex(c: Char): Char =
    if (c >= 'a' && c <= 'f') (c - 32).toChar else c
  @inline private def isUnreserved(code: Int): Boolean =
    (code >= 'A' && code <= 'Z') || (code >= 'a' && code <= 'z') ||
      (code >= '0' && code <= '9') ||
      code == '-' || code == '.' || code == '_' || code == '~'
  @inline private def isSchemeChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** One-pass RFC 3986 §6.2.2 percent-normalization — the scan
    * equivalent of the lookahead-split + transform token program
    * (each token starts at a `%`; the decode only ever inspects the
    * escape's own three chars, so per-`%` scanning is identical).
    */
  private def normalizePercent(s: String): String = {
    var i = s.indexOf('%')
    if (i < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && isHex(s.charAt(i + 1)) &&
        isHex(s.charAt(i + 2))) {
        val code = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(code)) sb.append(code.toChar)
        else sb.append('%').append(upperHex(s.charAt(i + 1)))
          .append(upperHex(s.charAt(i + 2)))
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Java regex line terminators (no UNIX_LINES): their presence sends
    * the row to the regex-mirror slow path, because `$` and `.`
    * interact with them in ways the fast scanner does not model.
    */
  private def hasLineTerminator(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
        c == '\u2029') return true
      i += 1
    }
    false
  }

  // slow-path mirrors of the column program's exact regexes
  private val SchemeRe = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val HostRe = Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)")
  private val PathRe =
    Pattern.compile("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)")
  private val QueryRe = Pattern.compile("\\?(.*)$")
  private val Port443Re = Pattern.compile(":443$")
  private val Port80Re = Pattern.compile(":80$")

  private def extract(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Literal re-evaluation of the column program for inputs with line
    * terminators — regexp_extract / regexp_replace / rlike semantics
    * exactly, at regex cost (the pathological-input tax).
    */
  private def canonicalSlow(s0: String, tracking: Pattern): UTF8String = {
    val u = normalizePercent(extract(Pattern.compile("^([^#]*)"), s0))
    val scheme = lowerLikeSpark(extract(SchemeRe, u))
    val rawHost = lowerLikeSpark(extract(HostRe, u))
    val host =
      if (scheme == "https") Port443Re.matcher(rawHost).replaceAll("")
      else if (scheme == "http") Port80Re.matcher(rawHost).replaceAll("")
      else rawHost
    val rawPath = extract(PathRe, u)
    val path = if (rawPath.isEmpty) "/" else rawPath
    val q = extract(QueryRe, u)
    assemble(scheme, host, path, q, tracking)
  }

  /** Filter + binary-sort the query params and assemble the canonical
    * string. Sorting compares UTF8String (byte order) — `array_sort`
    * parity, NOT Java UTF-16 order (they differ above the BMP).
    */
  private def assemble(scheme: String, host: String, path: String,
      q: String, tracking: Pattern): UTF8String = {
    val sb = new java.lang.StringBuilder(
      scheme.length + host.length + path.length + q.length + 4)
    sb.append(scheme).append("://").append(host).append(path)
    if (!q.isEmpty) {
      val kept = new java.util.ArrayList[UTF8String](8)
      var start = 0
      var i = 0
      val n = q.length
      while (i <= n) {
        if (i == n || q.charAt(i) == '&') {
          if (i > start) {
            val p = q.substring(start, i)
            if (!tracking.matcher(p).find()) kept.add(UTF8String.fromString(p))
          }
          start = i + 1
        }
        i += 1
      }
      if (!kept.isEmpty) {
        java.util.Collections.sort(kept)
        sb.append('?')
        var j = 0
        while (j < kept.size()) {
          if (j > 0) sb.append('&')
          sb.append(kept.get(j).toString)
          j += 1
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** The kernel: canonical form of `url` with tracking params dropped
    * by `tracking` (a compiled per-task pattern — see
    * [[graft.functions.CanonicalizeUrl]]).
    */
  def canonicalUrl(url: UTF8String, tracking: Pattern): UTF8String = {
    val s0 = url.toString
    if (hasLineTerminator(s0)) return canonicalSlow(s0, tracking)
    // fragment strip: prefix before the first '#'
    val hashIdx = s0.indexOf('#')
    val base = if (hashIdx >= 0) s0.substring(0, hashIdx) else s0
    val u = normalizePercent(base)
    val n = u.length
    // scheme: ^[A-Za-z][A-Za-z0-9+.-]*:// — the char class excludes
    // ':' and '/', so the regex is equivalent to "maximal class prefix
    // then a literal ://" with no backtracking ambiguity
    var schemeEnd = -1
    if (n > 0 && isAlpha(u.charAt(0))) {
      var i = 1
      while (i < n && isSchemeChar(u.charAt(i))) i += 1
      if (i + 2 < n && u.charAt(i) == ':' && u.charAt(i + 1) == '/' &&
        u.charAt(i + 2) == '/') schemeEnd = i
    }
    val scheme = if (schemeEnd > 0) lowerLikeSpark(u.substring(0, schemeEnd))
      else ""
    var host = ""
    var path = "/"
    if (schemeEnd > 0) {
      val hs = schemeEnd + 3
      var he = hs
      while (he < n && { val c = u.charAt(he)
        c != '/' && c != '?' && c != '#' }) he += 1
      if (he > hs) { // host regex requires ≥1 char; else both fail
        host = stripDefaultPort(lowerLikeSpark(u.substring(hs, he)), scheme)
        var pe = he
        while (pe < n && { val c = u.charAt(pe)
          c != '?' && c != '#' }) pe += 1
        if (pe > he) path = u.substring(he, pe)
      }
    }
    // query: everything after the FIRST '?' anywhere in u (the
    // column program's unanchored "\\?(.*)$" find)
    val qi = u.indexOf('?')
    val q = if (qi >= 0) u.substring(qi + 1) else ""
    assemble(scheme, host, path, q, tracking)
  }
}

/** `canonical_url(url[, tracking_regex])` — codegen'd canonical web
  * URL (see [[UrlKernels.canonicalUrl]]). The tracking regex must be
  * a literal: it compiles once per task (a codegen reference object),
  * never per row.
  */
case class CanonicalizeUrl(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val pattern: Pattern =
    Pattern.compile(right.eval().asInstanceOf[UTF8String].toString)

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  /** Typed ANALYSIS-time failures instead of executor-side casts: a
    * non-string argument must not surface as a ClassCastException in
    * a task, a non-foldable regex must not throw from the
    * constructor, and a null regex literal must not NPE the lazy
    * `pattern` (ADVICE r12).
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (!left.dataType.isInstanceOf[StringType] ||
      !right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments, got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: tracking regex must be a foldable string literal")
    else if (right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: tracking regex must not be null")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(url: Any, re: Any): Any =
    UrlKernels.canonicalUrl(url.asInstanceOf[UTF8String], pattern)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trackingRe", pattern,
      classOf[Pattern].getName)
    nullSafeCodeGen(ctx, ev, (u, _) =>
      s"${ev.value} = graft.functions.UrlKernels.canonicalUrl($u, $ref);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

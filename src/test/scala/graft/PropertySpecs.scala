package graft

import java.time.Instant

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.{Dates, Template}

/** Property tests (SURVEY.md §5 "our strategy"): the permissive toUTC
  * ladder, Mustache rendering, and interval parsing hold for arbitrary
  * inputs, not just the corpus examples.
  */
object DatesProps extends Properties("Dates.toUTC") {

  // sane epoch-second range: 2001..2033 (10-digit seconds)
  val epochGen: Gen[Long] = Gen.choose(1000000000L, 1999999999L)

  property("iso round-trip") = forAll(epochGen) { s =>
    val t = Instant.ofEpochSecond(s)
    Dates.toUTC(Dates.iso(t)) == t
  }

  property("epoch magnitude invariance: s == ms == µs == ns") =
    forAll(epochGen) { s =>
      val t = Instant.ofEpochSecond(s)
      Dates.toUTC(s) == t &&
        Dates.toUTC(s * 1000L) == t &&
        Dates.toUTC(s * 1000000L) == t &&
        Dates.toUTC(s * 1000000000L) == t
    }

  property("string digits behave like numeric epochs") =
    forAll(epochGen) { s =>
      Dates.toUTC(s.toString) == Dates.toUTC(s) &&
        Dates.toUTC((s * 1000L).toString) == Dates.toUTC(s * 1000L)
    }

  property("non-positive clamps to epoch zero") =
    forAll(Gen.choose(Long.MinValue / 2, 0L)) { s =>
      Dates.toUTC(s) == Instant.EPOCH
    }

  property("interval parse: value scales linearly") =
    forAll(Gen.choose(1, 10000), Gen.oneOf("day" -> 86400L, "hour" -> 3600L,
      "minute" -> 60L, "second" -> 1L, "week" -> 604800L)) { (n, unit) =>
      Dates.interval(s"$n ${unit._1}s").getSeconds == n * unit._2
    }
}

object TemplateProps extends Properties("Template") {

  val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  val literal: Gen[String] =
    Gen.listOf(Gen.frequency(9 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '.', ':', '/')))
      .map(_.mkString)

  property("literal templates render unchanged") = forAll(literal) { s =>
    Template.render(s, Map.empty[String, Any]) == s
  }

  property("flat variable substitutes; unknown renders empty") =
    forAll(ident, literal) { (k, v) =>
      Template.render(s"a {{$k}} b", Map(k -> v)) == s"a $v b" &&
        Template.render(s"a {{missing$k}} b", Map(k -> v)) == "a  b"
    }

  property("nested and indexed paths resolve") =
    forAll(ident, ident, literal) { (k1, k2, v) =>
      (k1 != k2) ==> Prop(
        Template.render(s"{{$k1.$k2}}", Map(k1 -> Map(k2 -> v))) == v &&
          Template.render(s"{{$k1.1.$k2}}",
            Map(k1 -> Seq(Map(k2 -> "no"), Map(k2 -> v)))) == v)
    }

  property("parts round-trip: literals + vars reassemble the template") =
    forAll(ident, ident) { (a, b) =>
      val tpl = s"x {{$a}} y {{$b.c}} z"
      Template.parts(tpl).map {
        case Left(s)  => s
        case Right(p) => s"{{$p}}"
      }.mkString == tpl
    }

  property("json-string context behaves like parsed map") =
    forAll(ident, Gen.alphaNumStr) { (k, v) =>
      val json = graft.functions.Json.write(Map(k -> v))
      Template.render(s"{{d.$k}}", Map("d" -> json)) ==
        Template.render(s"{{d.$k}}", Map("d" -> Map(k -> v)))
    }
}

/** Pure-JVM properties of the native expression kernels — no Spark
  * session needed: the kernels operate on ArrayData directly.
  */
object VecKernelProps extends Properties("VecKernels") {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String
  import graft.functions.VecKernels

  private def arr(xs: Seq[Double]) = new GenericArrayData(xs.toArray)
  private def sarr(ws: Seq[String]) =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  val vec: Gen[List[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-1000.0, 1000.0))
  val words: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))

  property("dot == strict left fold") = forAll(vec, vec) { (a, b) =>
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    VecKernels.dot(arr(a), arr(b)).doubleValue == expected
  }

  property("dot: length mismatch is null") = forAll(vec) { a =>
    VecKernels.dot(arr(a), arr(a ++ List(1.0))) == null
  }

  property("simhash64 is token-order invariant") = forAll(words) { ws =>
    val shuffled = new scala.util.Random(ws.length).shuffle(ws)
    VecKernels.simhash64(sarr(ws)) == VecKernels.simhash64(sarr(shuffled))
  }

  property("simhash64 is duplication invariant (distinct-token votes)") =
    forAll(words) { ws =>
      VecKernels.simhash64(sarr(ws)) == VecKernels.simhash64(sarr(ws ++ ws))
    }

  property("srpBucket stays in [0, 2^planes)") = forAll(vec) { a =>
    val b = VecKernels.srpBucket(arr(a), 8)
    b >= 0L && b < 256L
  }

  property("srpBucket is scale invariant (signs only)") = forAll(vec) { a =>
    VecKernels.srpBucket(arr(a), 8) ==
      VecKernels.srpBucket(arr(a.map(_ * 3.0)), 8)
  }

  val text: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("winnow_fp: nonempty, 31-bit values, deterministic") =
    forAll(text) { t =>
      val u = UTF8String.fromString(t)
      val fp = VecKernels.winnowFingerprints(u, 8, 4)
      val again = VecKernels.winnowFingerprints(u, 8, 4)
      fp.numElements() > 0 &&
        (0 until fp.numElements()).forall { i =>
          val v = fp.getLong(i); v >= 0L && v < 2147483648L
        } &&
        fp.toLongArray().toSeq == again.toLongArray().toSeq
    }

  property("winnow_fp: a shared long run yields shared fingerprints") =
    forAll(text, text) { (pre, post) =>
      // both docs embed the same 64-char core: at k=8/w=4 the core
      // contributes window minima on both sides
      val core = "the quick brown fox jumps over the lazy dog again and again ok!"
      val a = VecKernels.winnowFingerprints(
        UTF8String.fromString(pre + core), 8, 4).toLongArray().toSet
      val b = VecKernels.winnowFingerprints(
        UTF8String.fromString(core + post), 8, 4).toLongArray().toSet
      (a intersect b).nonEmpty
    }
}

/** Differential property for the O(n) incremental CDC chunker against
  * the direct per-window re-fold it replaced (the performance rewrite
  * must not move a single boundary).
  */
object CdcProps extends Properties("TextAnalysis.cdcChunks") {
  import graft.ops.TextAnalysis

  private val P = 2147483647L
  val asciiText: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))

  /** Reference: boundaries by re-folding each w-window from scratch. */
  private def refChunks(text: String, w: Int, divisor: Int): Seq[String] = {
    val n = text.length
    val bnds = Seq(0) ++ (w to n).filter { i =>
      val h = (i - w until i).foldLeft(0L)((a, j) =>
        (a * 31 + text.charAt(j)) % P)
      h % divisor == 0
    } ++ Seq(n)
    bnds.distinct.sorted.iterator.sliding(2).withPartial(false)
      .map { s => text.substring(s.head, s(1)) }
      .filter(_.nonEmpty).toSeq
  }

  property("incremental == direct re-fold, all window widths") =
    forAll(asciiText, Gen.oneOf(4, 8, 16), Gen.oneOf(16, 64)) { (t, w, d) =>
      TextAnalysis.cdcChunks(t, w, d) == refChunks(t, w, d)
    }

  property("chunks reassemble to the document") =
    forAll(asciiText) { t =>
      TextAnalysis.cdcChunks(t, 16, 64).mkString == t
    }
}

object SubscriptRewriteProps extends Properties("Criteria.rewriteSubscripts") {
  import graft.criteria.Criteria.rewriteSubscripts

  // SQL-ish text with no bracket characters anywhere
  val bracketFree: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.identifier, Gen.const("'a b'"), Gen.const("("), Gen.const(")"),
    Gen.const(" AND "), Gen.const("= 1"), Gen.const(", ")))
    .map(_.mkString(" "))

  property("identity on bracket-free text") = forAll(bracketFree) { s =>
    rewriteSubscripts(s) == s
  }

  property("brackets inside string literals never rewrite") =
    forAll(Gen.identifier, Gen.choose(0, 9)) { (id, i) =>
      val s = s"x = '$id[$i]'"
      rewriteSubscripts(s) == s
    }

  property("ident[i] becomes element_at(ident, i) for any identifier") =
    forAll(Gen.identifier, Gen.choose(1, 99)) { (id0, i) =>
      val id = s"c_$id0" // never the ARRAY keyword
      rewriteSubscripts(s"$id[$i] = 0") == s"element_at($id, $i) = 0"
    }

  property("output never contains a subscript bracket after a rewritable base") =
    forAll(Gen.identifier, Gen.choose(1, 9), Gen.choose(1, 9)) { (id, i, j) =>
      val out = rewriteSubscripts(s"f($id)[$i][$j]")
      !out.contains("[") && out ==
        s"element_at(element_at(f($id), $i), $j)"
    }

  property("a stray bracket never suppresses later rewrites") =
    forAll(Gen.identifier, Gen.choose(1, 9)) { (id0, i) =>
      val id = s"c_$id0"
      rewriteSubscripts(s"+[0] AND $id[$i] = 1") ==
        s"+[0] AND element_at($id, $i) = 1"
    }
}

object QuotedIdentProps extends Properties("Criteria.rewriteQuotedIdents") {
  import graft.criteria.Criteria.rewriteQuotedIdents

  property("identity without double quotes") = forAll(Gen.identifier) { id =>
    val s = s"$id = 'x \"y\" z'".replace("\"", "") + " AND b = 1"
    rewriteQuotedIdents(s) == s
  }

  property("double-quoted identifier becomes backtick-quoted") =
    forAll(Gen.identifier, Gen.identifier) { (a, b) =>
      rewriteQuotedIdents(s""""$a $b" = 1""") == s"`$a $b` = 1"
    }

  property("double quotes inside single-quoted literals are data") =
    forAll(Gen.identifier) { id =>
      val s = s"x = 'say \"$id\"'"
      rewriteQuotedIdents(s) == s
    }

  property("doubled-quote escape unescapes into the identifier") =
    forAll(Gen.identifier) { id =>
      rewriteQuotedIdents(s""""a""$id" = 1""") == s"`a\"$id` = 1"
    }
}

object DialectPrefixProps extends Properties("Criteria.rewrite prefixing") {
  import graft.criteria.Criteria.rewrite

  private val prefixed = Gen.oneOf(
    graft.functions.Functions.prefixedNames.toSeq)

  property("colliding names prefix exactly once: rewrite is idempotent") =
    forAll(prefixed, Gen.identifier) { (fn, arg) =>
      val s = s"$fn($arg, 'x') = 1"
      val once = rewrite(s)
      once == s"presto_$fn($arg, 'x') = 1" && rewrite(once) == once
    }

  property("call position only: bare identifiers never prefix") =
    forAll(prefixed) { fn =>
      rewrite(s"$fn = 1 AND x.$fn > 2") == s"$fn = 1 AND x.$fn > 2"
    }

  property("names inside string literals never prefix") =
    forAll(prefixed) { fn =>
      val s = s"x = 'use $fn(a) here'"
      rewrite(s) == s
    }

  property("every prefixedNames entry is (still) a Spark builtin — " +
      "else the prefix is dead weight") =
    forAll(prefixed) { fn =>
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn))
    }
}

/** The round-9 unification makes ONE lexer own all quoting; these pin
  * its losslessness on ARBITRARY input (not just SQL-shaped text):
  * rendering the token stream reproduces the input exactly unless a
  * pass actually rewrote something. Unterminated quotes lex as opaque
  * Raw spans and render verbatim — malformed input is never reshaped.
  */
object LexerRoundTripProps extends Properties("Criteria lexer") {
  import graft.criteria.Criteria

  property("render-of-lex is the identity on any text without " +
      "double-quoted identifiers") =
    forAll { (s0: String) =>
      val s = s0.replace("\"", "")
      Criteria.rewriteQuotedIdents(s) == s
    }

  property("subscript pass is the identity on arbitrary bracket-free " +
      "text (quotes, unicode, unterminated literals included)") =
    forAll { (s0: String) =>
      val s = s0.replace("[", "").replace("]", "")
      Criteria.rewriteSubscripts(s) == s
    }
}

/** ScalaCheck rows for the URL canonicalizer's RFC 3986 §6.2.2
  * percent-normalization (round-9 hardening): hex-case twins must
  * never split a canonical key, unreserved escapes must decode to
  * their literal form, and the whole program must be idempotent
  * (canonical output re-canonicalizes to itself — the property that
  * makes the key safe to persist and re-derive). Each sample batches
  * URLs into ONE DataFrame so a property run costs a handful of tiny
  * local jobs, not hundreds.
  */
object CanonicalUrlProps extends Properties("Curation.canonicalUrl") {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.col

  private lazy val spark: SparkSession =
    Tables.configure(SparkSession.builder()
      .master("local[4]").appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(8)

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(graft.ops.Curation.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  private val seg: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))

  property("hex case of an escape never splits a canonical key") =
    forAll(Gen.listOfN(8, Gen.zip(seg, Gen.choose(0, 255)))) { pairs =>
      val lo = pairs.map { case (s, b) => f"https://ex.com/$s%s?x=%%$b%02x" }
      val hi = pairs.map { case (s, b) => f"https://ex.com/$s%s?x=%%$b%02X" }
      canon(lo) == canon(hi)
    }

  property("unreserved escapes decode to the literal form") =
    forAll(Gen.listOfN(8, seg)) { segs =>
      val enc = segs.map { s =>
        f"https://ex.com/%%${s.head.toInt}%02X${s.tail}" }
      val plain = segs.map(s => s"https://ex.com/$s")
      canon(enc) == canon(plain)
    }

  property("canonicalUrl is idempotent on its own output") =
    forAll(Gen.listOfN(8, Gen.zip(seg, Gen.choose(0, 255)))) { pairs =>
      val urls = pairs.map { case (s, b) =>
        f"https://Ex.COM:443/$s%s?b=2&a=%%$b%02x#frag" }
      val once = canon(urls)
      canon(once) == once
    }

  // the round-12 native kernel (functions/UrlExpressions.scala) must
  // be BIT-EXACT with the original column program on arbitrary messy
  // input — mixed-case schemes/hosts, default and non-default ports,
  // escapes of every byte in both hex casings, fragments hiding '?',
  // empty/duplicated params, and outright garbage
  private val messyUrl: Gen[String] = {
    val schemes = Gen.oneOf("https", "HTTPS", "http", "hTTp", "ftp", "")
    val ports = Gen.oneOf("", ":443", ":80", ":8080")
    val frag = Gen.oneOf("", "#f", "#f?not=query", "#")
    for {
      sch <- schemes; hostSeg <- seg; port <- ports
      pathB <- Gen.choose(0, 255); pathHexUp <- Gen.oneOf(true, false)
      p1 <- seg; p2 <- seg; junk <- Gen.oneOf("", "&", "&&", "&utm_x=1",
        "&ref=z", "&%G1=bad", "&x=100%")
      fr <- frag
      garbage <- Gen.oneOf(false, false, false, true)
      g <- Gen.alphaNumStr
    } yield
      if (garbage) g
      else {
        val esc = f"%%$pathB%02x"
        val escC = if (pathHexUp) esc.toUpperCase else esc
        s"$sch://$hostSeg.Ex.COM$port/p$escC/$p1?b=$p2&a=1$junk$fr"
      }
  }

  property("native canonical_url kernel == the original column " +
      "program (differential, messy input)") =
    forAll(Gen.listOfN(12, messyUrl)) { urls =>
      import spark.implicits._
      val rows = urls.toDF("url").select(
          graft.ops.Curation.canonicalUrl(col("url")).as("native"),
          graft.ops.Curation.canonicalUrlColumnar(col("url"))
            .as("columnar"))
        .collect()
      rows.forall(r => r.getString(0) == r.getString(1))
    }

  // fixed pathological battery, run once: line terminators (the
  // regex-mirror slow path — Java `$`/dot-terminator semantics),
  // decode-created schemes, empty/edge inputs, non-BMP text,
  // multi-'?' queries, every port/scheme casing corner
  property("native kernel == column program on the fixed edge battery " +
      "(slow path, decode-created scheme, non-BMP, empties)") = {
    val battery = Seq(
      "", "x", "://", "a://", "http://", "http://?x=1", "http:///p",
      "a:/x", "%68ttp://UP.ex:80/p?b=2&a=1", "https://ex.com:443",
      "ftp://h:443/p", "https://h:443:443/p", "http://h:80:80/p",
      "https://ex.com/p?a=1?b=2&c=3", "https://ex.com/p?&&a=1&",
      "https://ex.com/p?x=1\nref=2", "http://ex.com:80/p\n?a=1",
      "https://ex.com/p?a=\r1#f\nx", "https://ex.com/p?a=\u20281",
      "https://ex.com/p?a=\u00851&b=2", "https://ex.com:443\n/p?x=:443",
      "https://ex.com/\ud83d\ude00?emoji=\ud83d\ude00&a=1",
      "https://b\u00fccher.example:443/p?x=1",
      "https://ex.com/p?%ZZ=1&%2f=2&%41=3", "https://ex.com/p?x=100%",
      "#onlyfragment", "?onlyquery=1", "https://ex.com/p#f?hidden=1",
      "HTTPS://EX.COM:443#f", "https://ex.com/p?utm_a=1&UTM_b=2")
    import spark.implicits._
    val rows = battery.toDF("url").select(
        graft.ops.Curation.canonicalUrl(col("url")).as("native"),
        graft.ops.Curation.canonicalUrlColumnar(col("url"))
          .as("columnar"))
      .collect()
    rows.forall(r => r.getString(0) == r.getString(1))
  }
}

/** ScalaCheck rows for the robots.txt rule compiler: every regex
  * metacharacter in a pattern is a LITERAL (except `*` and a trailing
  * `$`), so the gate's verdict on metachar-free-or-not patterns must
  * equal plain string prefix matching; a trailing `$` anchors exactly;
  * a longer `Allow` beats a shorter `Disallow`. One batched DataFrame
  * per sample (the CanonicalUrlProps cost discipline).
  */
object RobotsProps extends Properties("Curation.robots") {
  import org.apache.spark.sql.SparkSession

  private lazy val spark: SparkSession =
    Tables.configure(SparkSession.builder()
      .master("local[4]").appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(6)

  // pattern/target alphabet: regex metachars INCLUDED (they must act
  // as literals); '*' '$' '#' and whitespace excluded ('*'/'$' carry
  // wildcard meaning, '#' starts a robots comment)
  private val ch: Gen[Char] = Gen.oneOf(
    ('a' to 'z') ++ ('0' to '9') ++ ".(){}+?|[]^\\:-_~".toSeq)
  private val segG: Gen[String] =
    Gen.nonEmptyListOf(ch).map(s => "/" + s.mkString.take(10))

  /** Gate each (host_i, body_i, target_i) triple in one batch; return
    * allowed flags in input order.
    */
  private def gate(rows: Seq[(String, String)]): Seq[Boolean] = {
    import spark.implicits._
    val hosts = rows.zipWithIndex.map { case ((body, _), i) =>
      (s"h$i.ex", body) }
    val urls = rows.zipWithIndex.map { case ((_, t), i) =>
      (i.toLong, s"https://h$i.ex$t") }
    val rules = graft.ops.Curation.parseRobots(
      hosts.toDF("host", "body"))
    val m = graft.ops.Curation.robotsGate(urls.toDF("id", "url"), rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    rows.indices.map(i => m(i.toLong))
  }

  property("metachar-free-of-wildcards patterns gate by plain string " +
      "prefix — regex specials are literals") =
    forAll(Gen.listOfN(6, Gen.zip(segG, segG))) { pairs =>
      val rows = pairs.flatMap { case (p, s) =>
        val mut = "/" + (if (p.length > 1) "z" + p.drop(2) else "z")
        Seq((s"User-agent: *\nDisallow: $p\n", p),         // exact
          (s"User-agent: *\nDisallow: $p\n", p + s),       // extension
          (s"User-agent: *\nDisallow: $p\n", mut))         // near miss
      }
      val got = gate(rows)
      rows.zip(got).forall { case ((body, t), allowed) =>
        val p = body.split("Disallow: ")(1).stripSuffix("\n")
        allowed == !t.startsWith(p)
      }
    }

  property("a trailing '$' anchors the pattern to the whole target") =
    forAll(Gen.listOfN(6, Gen.zip(segG, segG))) { pairs =>
      val rows = pairs.flatMap { case (p, s) =>
        Seq((s"User-agent: *\nDisallow: $p$$\n", p),       // exact → block
          (s"User-agent: *\nDisallow: $p$$\n", p + s))     // longer → pass
      }
      val got = gate(rows)
      pairs.indices.forall(i => !got(2 * i) && got(2 * i + 1))
    }

  property("a longer Allow overrides a shorter Disallow on its own " +
      "subtree only") =
    forAll(Gen.listOfN(6, Gen.zip(segG, segG))) { pairs =>
      val rows = pairs.flatMap { case (p, q) =>
        val body = s"User-agent: *\nDisallow: $p\nAllow: $p$q\n"
        Seq((body, p + q),                                  // allow wins
          (body, p))                                        // disallow only
      }
      val got = gate(rows)
      pairs.indices.forall(i => got(2 * i) && !got(2 * i + 1))
    }

  property("the per-host rule cap is a no-op whenever it meets or " +
      "exceeds the rule count — verdicts identical at cap = n and " +
      "cap = 1000") =
    forAll(Gen.listOfN(4, segG), Gen.listOfN(5, segG)) { (pats, targets) =>
      import spark.implicits._
      // one host, n = 2·|pats| rules (each pattern as Disallow + a
      // longer Allow), gated at the exact rule count vs the default
      val body = "User-agent: *\n" + pats.map(p =>
        s"Disallow: $p\nAllow: ${p}x\n").mkString
      val rules = graft.ops.Curation.parseRobots(
        Seq(("h.ex", body)).toDF("host", "body"))
      val n = rules.count().toInt
      val urls = (pats.map(p => s"https://h.ex$p") ++
        pats.map(p => s"https://h.ex${p}x") ++
        targets.map(t => s"https://h.ex$t"))
        .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      def verdicts(cap: Int) = graft.ops.Curation.robotsGate(
          urls.toDF("id", "url"), rules, maxRulesPerHost = cap)
        .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSeq
      n >= 1 && verdicts(n) == verdicts(1000)
    }
}

/** HTML kernel robustness (the q417/q419 extraction): lax mode is
  * TOTAL over arbitrary markup-ish soup, the block invariants hold
  * on whatever comes out, strict mode's throw set is exactly the
  * truncated-structure class, and plain text passes through as its
  * whitespace-collapsed self.
  */
object HtmlProps extends Properties("Html.extractBlocks") {
  import graft.ops.Html

  // markup-ish soup: text runs, tags (well-formed and not), entity
  // fragments, comments, raw-text elements, quotes, bare delimiters
  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r\n"),
    2 -> Gen.oneOf("<p>", "</p>", "<div class='x'>", "<br/>", "</ul>",
      "<a href=\"u?a>b\">", "<SPAN>", "</i>"),
    1 -> Gen.oneOf("<", ">", "&", "&amp;", "&#65;", "&#x42;", "&nbsp;",
      "&bogus;", "&#;", "%"),
    1 -> Gen.oneOf("<!-- c -->", "<!DOCTYPE html>", "<?pi?>",
      "<script>if(1<2){}</script>", "<style>p{}</style>"),
    1 -> Gen.oneOf("<!--", "<script>", "<div", "'", "\""))
  private val soup: Gen[String] =
    Gen.listOf(token).map(_.mkString)

  property("lax mode is total and its blocks hold the invariants: " +
      "non-empty, trimmed, single-spaced, newline-free") =
    forAll(soup) { s =>
      val blocks = Html.extractBlocks(s, strict = false)
      blocks.forall(b => b.nonEmpty && b == b.trim &&
        !b.contains("  ") && !b.exists(c => c == '\n' || c == '\t'))
    }

  property("strict mode either agrees with lax exactly or throws " +
      "MalformedHtmlException — never a third behavior") =
    forAll(soup) { s =>
      val lax = Html.extractBlocks(s, strict = false).toSeq
      try Html.extractBlocks(s, strict = true).toSeq == lax
      catch { case _: Html.MalformedHtmlException => true }
    }

  property("markup-free text extracts as ONE block equal to its " +
      "whitespace-collapsed trim (empty text: zero blocks)") =
    forAll(Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumStr.map(_.take(6)),
      2 -> Gen.oneOf(" ", "\t", "\n", "  "))).map(_.mkString)) { s =>
      val collapsed = s.replaceAll("[\\s ]+", " ").trim
      val blocks = Html.extractBlocks(s).toSeq
      if (collapsed.isEmpty) blocks.isEmpty
      else blocks == Seq(collapsed)
    }

  property("appending an unterminated comment throws in strict mode " +
      "and is ignored in lax mode (the truncated-fetch contract)") =
    forAll(soup) { s =>
      // close any open raw-text element so the comment is the ONLY
      // truncation; parse the prefix leniently as the reference
      val base = s + "</script></style>x"
      val cut = base + "<!-- truncated"
      val laxAgree = Html.extractBlocks(cut, strict = false).toSeq ==
        Html.extractBlocks(base + "<!-- truncated -->",
          strict = false).toSeq
      val strictThrows =
        try { Html.extractBlocks(cut, strict = true); false }
        catch { case _: Html.MalformedHtmlException => true }
      laxAgree && strictThrows
    }
}

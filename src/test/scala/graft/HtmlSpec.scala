package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html
import graft.ops.Multimodal.Blob

/** Behavior pins for the HTML → text extraction kernel (the
  * WARC→text→curation chain's first step; q417 gates it end-to-end
  * through the oracle). Every rule in Html's class doc has a
  * hand-computed row here, plus the strict/lax corrupt-markup
  * contract.
  */
class HtmlSpec extends AnyFunSuite with SparkSuite {

  private def blocks(html: String): Seq[String] =
    Html.extractBlocks(html).toSeq

  test("tag strip + block segmentation: block tags flush (open AND " +
      "close, case-insensitive), inline tags don't, empties drop") {
    assert(blocks("<html><body><H1>head</H1><p>a <b>bold</b> c</p>" +
      "<DIV>d</DIV></body></html>") ===
      Seq("head", "a bold c", "d"))
    // list/table internals are their own blocks
    assert(blocks("<ul><li>x</li><li>y</li></ul>" +
      "<table><tr><td>c1</td><td>c2</td></tr></table>") ===
      Seq("x", "y", "c1", "c2"))
    // plain text with no markup is one block
    assert(blocks("just text") === Seq("just text"))
    assert(blocks("") === Seq.empty)
  }

  test("raw-text elements: script/style bodies drop whole, including " +
      "'<' inside them; close tag matches case-insensitively") {
    assert(blocks("<p>a</p><script>if(1<2){x='</p>';}</SCRIPT><p>b</p>")
      === Seq("a", "b"))
    assert(blocks("<style>p{color:red}</style><p>c</p>") === Seq("c"))
  }

  test("comments and markup declarations drop; quoted '>' does not " +
      "end a tag; bare '<' is literal text") {
    assert(blocks("<!DOCTYPE html><p>a<!-- <p>hidden</p> -->b</p>") ===
      Seq("ab"))
    assert(blocks("""<p>t <a href="u?a>b">link</a> s</p>""") ===
      Seq("t link s"))
    // '<' not opening a tag: before a space, a digit, at end of input
    assert(blocks("<p>1 < 2 and 3<4 and tail<</p>") ===
      Seq("1 < 2 and 3<4 and tail<"))
  }

  test("character references: named, decimal, hex; unknown/malformed/" +
      "out-of-range verbatim; nbsp and numeric whitespace collapse") {
    assert(blocks("<p>&amp;&lt;&gt;&quot;&apos;</p>") === Seq("&<>\"'"))
    assert(blocks("<p>&#65;&#x42;&#x63;</p>") === Seq("ABc"))
    // nbsp decodes to a PLAIN space and collapses with neighbors;
    // &#32; and &#10; route through the same whitespace collapser
    assert(blocks("<p>a&nbsp; &nbsp;b&#32;&#32;c&#10;d</p>") ===
      Seq("a b c d"))
    // unknown entity, bare '&', no ';' nearby, malformed numerics,
    // surrogate and out-of-range code points: all verbatim
    assert(blocks("<p>q&foo;w & r &#; &#xD800; &#x110000; s</p>") ===
      Seq("q&foo;w & r &#; &#xD800; &#x110000; s"))
  }

  test("whitespace runs (space/tab/newline/NBSP char) collapse to one " +
      "space inside a block; block edges trim") {
    assert(blocks("<p>  a\t\t b \r\n c d  </p>") === Seq("a b c d"))
  }

  test("strict mode fails LOUDLY on truncated structure — " +
      "unterminated comment, tag, and raw-text element") {
    intercept[Html.MalformedHtmlException] {
      Html.extractBlocks("<p>a</p><!-- never closed")
    }
    intercept[Html.MalformedHtmlException] {
      Html.extractBlocks("<p>a</p><div class='x")
    }
    intercept[Html.MalformedHtmlException] {
      Html.extractBlocks("<p>a</p><script>var x = 1;")
    }
  }

  test("lax mode salvages browser-style: the unterminated construct " +
      "consumes to end-of-input, deterministically") {
    assert(Html.extractBlocks("<p>a</p><!-- never closed",
      strict = false).toSeq === Seq("a"))
    assert(Html.extractBlocks("<p>a</p><div class='x",
      strict = false).toSeq === Seq("a"))
    assert(Html.extractBlocks("<p>a</p><script>var x = 1;",
      strict = false).toSeq === Seq("a"))
  }

  test("docTexts: per-doc extraction over binary payloads; corrupt " +
      "markup fails loudly WITH ITS DOC ID under strict") {
    import spark.implicits._
    val good = Seq(
      Blob(1L, "<h1>t</h1><p>one</p>".getBytes("UTF-8")),
      Blob(2L, "plain".getBytes("UTF-8")))
    val out = Html.docTexts(spark.createDataset(good)).collect()
      .map(d => d.doc_id -> ((d.text, d.n_blocks))).toMap
    assert(out(1L) === (("t\none", 2)))
    assert(out(2L) === (("plain", 1)))
    val bad = spark.createDataset(Seq(
      Blob(7L, "<p>a</p><!-- boom".getBytes("UTF-8"))))
    val err = intercept[Exception] {
      Html.docTexts(bad).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m => m.contains("doc 7") &&
      m.contains("unterminated comment")))
  }
}

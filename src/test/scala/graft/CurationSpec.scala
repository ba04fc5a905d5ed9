package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

/** Behavior pins for the curation operators (q58-q62). The DuckDB
  * oracle gate verifies them end-to-end on the fixture corpus; these
  * specs pin the SEMANTICS on hand-crafted docs where the expected
  * values are computable by eye.
  */
class CurationSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("decontaminate flags only docs sharing an n-gram with the eval set") {
    val corpus = docs(
      (1L, "alpha beta gamma delta", "s"),        // shares "alpha beta gamma"
      (2L, "beta gamma alpha delta", "s"),        // same words, no shared 3-gram
      (3L, "zeta eta theta iota", "s"))           // disjoint vocabulary
    val eval = docs((100L, "alpha beta gamma epsilon", "s"))
    val out = Curation.decontaminate(corpus, eval).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 1L, 100L)))
  }

  test("contaminationOverlap: per-EVAL ppm of distinct grams the corpus holds") {
    val corpus = docs(
      (1L, "a b c d", "s"),            // grams: abc bcd
      (2L, "x y z w", "s"))            // grams: xyz yzw
    val eval = docs(
      (100L, "a b c q r", "s"),        // grams: abc bcq cqr → 1/3 hit
      (105L, "m n o p", "s"))          // grams: mno nop → 0/2 hit
    val out = Curation.contaminationOverlap(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (100L, 3L, 1L, 333333L, true),   // floor(1e6/3), over 10% → dirty
      (105L, 2L, 0L, 0L, false)))
  }

  test("contaminationOverlap counts a repeated eval gram once") {
    val corpus = docs((1L, "a b c d", "s"))
    // "a b c" occurs twice in the eval doc; distinct grams are
    // {abc, bca, cab} → 3, of which only abc is in the corpus
    val eval = docs((100L, "a b c a b c", "s"))
    val out = Curation.contaminationOverlap(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((100L, 3L, 1L)))
  }

  test("sourceOverlapMatrix: exact pairwise Jaccard and containments " +
      "over distinct gram vocabularies") {
    val corpus = docs(
      (1L, "a b c d", "s1"),           // grams: abc bcd
      (2L, "a b c", "s2"),             // grams: abc
      (3L, "x y z", "s3"),             // grams: xyz (disjoint)
      (4L, "a b c d", "s1"))           // duplicate doc — grams dedupe
    val out = Curation.sourceOverlapMatrix(corpus).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    // only s1×s2 shares anything: inter=1, |s1|=2, |s2|=1 →
    // jaccard = floor(1e6/2), contain_a = 1/2, contain_b = 1/1
    assert(out.toSeq === Seq(
      ("s1", "s2", 2L, 1L, 1L, 500000L, 500000L, 1000000L)))
  }

  test("bloomDecontaminate matches decontaminate's exact output " +
      "(false positives die at the verify)") {
    val corpus = docs(
      (1L, "alpha beta gamma delta", "s"),
      (2L, "beta gamma alpha delta", "s"),
      (3L, "zeta eta theta iota", "s"))
    val eval = docs(
      (100L, "alpha beta gamma epsilon", "s"),
      (101L, "beta gamma alpha kappa", "s"))
    val exact = Curation.decontaminate(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // a deliberately tiny filter (64 bits) forces false positives at
    // the prefilter; the verify join must still kill every one
    val bloom = Curation.bloomDecontaminate(corpus, eval,
      estItems = 4L, numBits = 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bloom === exact)
    assert(exact.map(_._1) === Seq(1L, 2L)) // doc 3 shares nothing
  }

  test("epochAllocation: halving marginal value, boundary pick partial") {
    val corpus = docs(
      (1L, "a b c d e f g h i j", "big"),   // 10 tokens
      (2L, "k l m n", "small"))              // 4 tokens
    // maxEpochs=2, budget=17. candidates (value = n·2^(2-k)):
    //   (big,1)=20, (small,1)=8, (big,2)=10, (small,2)=4
    // order: big1(20) → small1(8) → big2(10) → wait: 10 > 8!
    // order by value desc: big1(20), big2(10), small1(8), small2(4)
    // cum: 0, 10, 20 → small1 alloc = min(4, 17-20) ≤ 0 → dropped;
    // big2 alloc = min(10, 17-10) = 7 (partial boundary pick)
    val out = Curation.epochAllocation(corpus, budgetTokens = 17L,
      maxEpochs = 2).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      ("big", 1, 10L, 20L, 0L, 10L),
      ("big", 2, 10L, 10L, 10L, 7L)))
  }

  test("removeDupSpans: later occurrences of a span go, first stays") {
    val corpus = docs(
      (1L, "a b c d e", "s"),          // holds the first "a b c d"
      (2L, "a b c d x", "s"),          // dup span at pos 1 → a b c d removed
      (3L, "q q q q", "s"))            // only span occurs once → kept
    val out = Curation.removeDupSpans(corpus, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 5L, 5L, 0L, "a b c d e"),
      (2L, 5L, 1L, 4L, "x"),
      (3L, 4L, 4L, 0L, "q q q q")))
  }

  test("removeDupSpans: overlapping dup spans union their coverage; " +
      "within-doc repeats count as duplicates") {
    // doc 1 pos1 "a b c" is globally first; doc 1 pos4 "a b c" is a
    // WITHIN-doc duplicate → tokens 4-6 removed; doc 2's overlapping
    // dup spans at pos 1 ("a b c") and pos 3 ("c a b" — first seen at
    // doc 1 pos 3? no: "c a b" first occurs doc 1 pos 3) remove 1-5
    val corpus = docs(
      (1L, "a b c a b c", "s"),        // grams: abc(1) bca(2) cab(3) abc(4)
      (2L, "a b c a b", "s"))          // grams: abc(1) bca(2) cab(3)
    val out = Curation.removeDupSpans(corpus, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // doc 1: abc@4 dup (first was doc1@1) → covers 4,5,6 → keep "a b c"
    // doc 2: abc@1, bca@2, cab@3 all dups of doc 1 → cover 1..5 → ""
    assert(out.toSeq === Seq(
      (1L, 6L, 3L, 3L, "a b c"),
      (2L, 5L, 0L, 5L, "")))
  }

  test("decontaminate counts distinct shingles once per corpus doc across eval docs") {
    val corpus = docs((1L, "a b c d e", "s"))     // shingles: abc bcd cde
    val eval = docs(
      (100L, "a b c x y", "s"),                   // shares abc
      (101L, "a b c d q", "s"))                   // shares abc AND bcd
    val out = Curation.decontaminate(corpus, eval).collect()
    // distinct shared shingles = {abc, bcd} = 2 (abc matching two eval
    // docs counts once); eval_hit is the smallest eval id
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 100L)))
  }

  test("fuzzyDecontaminate flags banded near-dups, ignores disjoint docs") {
    val corpus = docs(
      (1L, "a b c d e f", "s"),        // identical to eval 100
      (2L, "z1 z2 z3 z4 z5", "s"))     // disjoint vocabulary
    val eval = docs((100L, "a b c d e f", "s"))
    // identical text → identical signatures → every band agrees →
    // candidate survives; exact Jaccard 1.0 → 1_000_000 micro-units
    val out = Curation.fuzzyDecontaminate(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 1L, 100L, 1000000L)))
  }

  test("fuzzyDecontaminate aggregates per corpus doc across eval hits") {
    val corpus = docs((1L, "a b c d e f", "s"))
    val eval = docs(
      (101L, "a b c d e f", "s"),
      (100L, "a b c d e f", "s"))
    val out = Curation.fuzzyDecontaminate(corpus, eval).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // both eval docs hit; eval_hit is the SMALLEST eval id
    assert(out.toSeq === Seq((1L, 2L, 100L, 1000000L)))
  }

  test("repetition: top-2gram char fraction and duplicate-5gram position fraction") {
    // "x y x y x y" (11 chars): 2-grams = [x y, y x, x y, y x, x y] →
    // top gram "x y" (len 3) cnt 3 → top_chars 9 → 9e6/11 = 818181.8 →
    // floor 818181. 5-grams: [x y x y x, y x y x y] all unique →
    // dup5 = 0. keep = false (top2 over 20%).
    val out = Curation.repetition(docs((1L, "x y x y x y", "s"))).collect()
    assert(out === Array(Row(1L, "x y", 818181L, 0L, false)))
  }

  test("repetition: duplicated 5-gram positions count, unique docs keep") {
    // seven words "a b c d e a b c d e" → wait, use an explicit repeat:
    // "p q r s t p q r s t" (10 words): 5-grams at positions 1..6:
    // pqrst, qrstp, rstpq, stpqr, tpqrs, pqrst → "p q r s t" occurs
    // twice → dup_pos 2, tot_pos 6 → floor(2e6/6) = 333333 (< 300000 is
    // false → keep false). top 2-gram "p q" cnt 2, len 3 → 6 chars of
    // 19 → 315789 ppm.
    val out = Curation.repetition(docs((1L, "p q r s t p q r s t", "s"))).collect()
    assert(out === Array(Row(1L, "p q", 315789L, 333333L, false)))
  }

  test("repetition: docs shorter than the gram size score zero and keep") {
    val out = Curation.repetition(docs((1L, "one", "s"), (2L, "two words", "s")))
      .collect()
    // 1-word doc: no 2-grams at all → top_gram null, both metrics 0
    assert(out(0) === Row(1L, null, 0L, 0L, true))
    // 2-word doc: one 2-gram covering all 9 chars → 1e6 ppm, no 5-grams
    assert(out(1) === Row(2L, "two words", 1000000L, 0L, false))
  }

  test("stratified sample is a pure function of (doc_id, label) and respects rates") {
    val d = docs((1L to 2000L).map(i => (i, "w", if (i % 2 == 0) "even" else "odd")): _*)
    val out = Curation.stratifiedSample(d, Map("even" -> 1000), defaultPpk = 0,
      labelCol = "source")
    val rows = out.collect()
    // rate 1000‰ keeps every even doc; rate 0 drops every odd doc
    assert(rows.length === 1000)
    assert(rows.forall(_.getString(1) == "even"))
    // deterministic: second run identical
    assert(Curation.stratifiedSample(d, Map("even" -> 1000), defaultPpk = 0,
      labelCol = "source").collect() === rows)
    // partial rate lands near its expectation (mix31 is uniform-ish):
    // 300‰ of 1000 docs → expect ~300, accept a generous band
    val part = Curation.stratifiedSample(d, Map("even" -> 300), defaultPpk = 0,
      labelCol = "source").count()
    assert(part > 200 && part < 400, s"300‰ sample kept $part of 1000")
  }

  test("tfidf: rare terms outrank common ones; ties break lexicographically") {
    val d = docs(
      (1L, "rare common common", "s"),
      (2L, "common common common", "s"),
      (3L, "common other other", "s"))
    val out = Curation.tfidfTopK(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(5)))
    // doc 1: rare tf=1 df=1 → 1e6; common tf=2 df=3 → 666666
    assert(out.filter(_._1 == 1L).toSeq ===
      Seq((1L, 1, "rare", 1000000L), (1L, 2, "common", 666666L)))
    // doc 3: other tf=2 df=1 → 2e6 beats common tf=1 df=3 → 333333
    assert(out.filter(_._1 == 3L).toSeq ===
      Seq((3L, 1, "other", 2000000L), (3L, 2, "common", 333333L)))
  }

  test("packSequences: sequential fill per shard, bins by tokens-before") {
    // shard A docs of 3 tokens each, budget 5: cum_before 0,3,6,9 →
    // bins 0,0,1,1; shard B restarts at bin 0
    val d = docs(
      (1L, "a b c", "A"), (2L, "d e f", "A"), (3L, "g h i", "A"), (4L, "j k l", "A"),
      (10L, "m n o", "B"))
    val out = Curation.packSequences(d, budgetTokens = 5L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "A", 0L), (2L, "A", 0L), (3L, "A", 1L), (4L, "A", 1L), (10L, "B", 0L)))
  }

  test("stratifiedFixedK: exactly k per stratum, short strata keep all") {
    val d = (0L until 40L).map(i => (i, "t", if (i < 30) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val out = Curation.stratifiedFixedK(d, k = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.count(_._1 == "big") === 4)
    assert(out.count(_._1 == "small") === 4)
    val tiny = Curation.stratifiedFixedK(d.where($"doc_id" >= 38), k = 4).collect()
    assert(tiny.length === 2)                       // stratum smaller than k
    // deterministic: same ids on re-run
    val again = Curation.stratifiedFixedK(d, k = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === out.toSeq)
  }

  test("vocabTopK: rank by freq desc then term; cumulative coverage is exact") {
    val d = docs((1L, "b a b c b a", "s"))  // b:3 a:2 c:1, total 6
    val out = Curation.vocabTopK(d, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, "b", 3L, 500000L),          // 3/6
      (2, "a", 2L, 833333L)))         // 5/6
  }

  test("chunkTokens: fixed windows, remainder tail, single-space rebuild") {
    val d = docs((1L, "a b c d e", "s"), (2L, "x y", "s"))
    val out = Curation.chunkTokens(d, width = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 0, 2L, "a b"), (1L, 1, 2L, "c d"), (1L, 2, 1L, "e"),
      (2L, 0, 2L, "x y")))
  }

  test("chunkTokens property: chunks reassemble to the original text at any width") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 30).map { i =>
      val n = 1 + rnd.nextInt(80)
      (i.toLong, Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" "), "s")
    }
    val d = rows.toDF("doc_id", "text", "source")
    for (width <- Seq(1, 7, 32)) {
      val chunks = Curation.chunkTokens(d, width).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      val reassembled = chunks.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._4).mkString(" ")
      }
      rows.foreach { case (id, text, _) =>
        assert(reassembled(id) === text, s"width=$width doc=$id")
      }
      // token counts partition the doc: every chunk but the tail is full
      chunks.groupBy(_._1).foreach { case (id, cs) =>
        val sorted = cs.sortBy(_._2)
        assert(sorted.init.forall(_._3 == width.toLong))
        assert(sorted.map(_._3).sum === rows(id.toInt)._2.split(" ").length.toLong)
      }
    }
  }

  test("scrubPii is idempotent: scrubbing clean text changes nothing") {
    val d = docs((1L, "mail bob@example.com and 10.1.2.3 end", "s"))
    val once = Curation.scrubPii(d).select($"doc_id", $"clean".as("text"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val twice = Curation.scrubPii(once).collect()(0)
    assert(twice.getLong(1) === 0L && twice.getLong(2) === 0L)
    assert(twice.getString(3) === "mail <EMAIL> and <IP> end")
  }

  test("vocabTopK: cumulative coverage is nondecreasing and caps at 1e6") {
    val d = docs((1L, "a b c a b a", "s"), (2L, "b d d e", "s"))
    val out = Curation.vocabTopK(d, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(3)))
    assert(out.sliding(2).forall(p => p.length < 2 || p(0)._2 <= p(1)._2))
    assert(out.last._2 === 1000000L)   // k >= vocab: full coverage
  }

  test("scrubPii counts on original text and redacts emails before IPs") {
    val d = docs(
      (1L, "mail bob@example.com and 10.1.2.3 end", "s"),
      (2L, "no pii here", "s"),
      (3L, "a@b.co x 999.999.999.999", "s"))
    val out = Curation.scrubPii(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 1L, 1L, "mail <EMAIL> and <IP> end")))
    assert(out(1) === ((2L, 0L, 0L, "no pii here")))
    // the IP check is shape-only by design — 999.x still redacts
    assert(out(2) === ((3L, 1L, 1L, "<EMAIL> x <IP>")))
  }

  test("scrubPii: dotted-quad email host is not an email (no alpha TLD) but is an IP") {
    val out = Curation.scrubPii(docs((1L, "u@1.2.3.44 tail", "s"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === ((1L, 0L, 1L, "u@<IP> tail")))
  }

  test("lexicalDiversity: ttr, hapax and mean word length are exact floors") {
    // tokens 4; types 3 (aa,bb,cc); hapax 2 of 3 types; chars 8
    val out = Curation.lexicalDiversity(docs((1L, "aa bb aa cc", "s"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out(0) === ((1L, 4L, 3L, 750000L, 666666L, 2000000L)))
  }

  test("splitAssign: exhaustive, deterministic, roughly 80/10/10") {
    val d = (0L until 1000L).map(i =>
      (i, "w x y z", if (i % 2 == 0) "a" else "b")).toDF("doc_id", "text", "source")
    val out = Curation.splitAssign(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._3).sum === 1000L)                    // every doc lands somewhere
    out.foreach { case (_, _, nd, nt) => assert(nt === nd * 4) }
    val train = out.filter(_._1 == "train").map(_._3).sum
    assert(train > 700 && train < 900, s"train kept $train of 1000")
    // re-running is bit-identical — the split is a pure hash function
    val again = Curation.splitAssign(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === out.toSeq)
  }

  test("weightedPrioritySample picks the k smallest hash-over-weight ranks") {
    val docs = Tables(spark, sf(), "documents")
    val got = Curation.weightedPrioritySample(docs, k = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_key")))
    // brute-force reference from the same hash column
    val all = Curation.weightedPrioritySample(docs, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("rank_key"), r.getAs[Long]("doc_id")))
    assert(got.map(x => (x._2, x._1)).toSeq === all.sorted.take(10).toSeq)
    // heavier docs are favored in expectation: winners' mean weight
    // exceeds the corpus mean (sanity, not a distributional proof)
    val winW = Curation.weightedPrioritySample(docs, k = 50).collect()
      .map(_.getAs[Long]("weight"))
    val allW = Curation.weightedPrioritySample(docs, k = Int.MaxValue).collect()
      .map(_.getAs[Long]("weight"))
    assert(winW.sum.toDouble / winW.length > allW.sum.toDouble / allW.length)
  }

  test("percentileGate keeps exactly the top keepTopPpk share per label") {
    val d = (1L to 20L).map(i => (s"s${i % 2}", i, i)).toDF("source", "doc_id", "score")
    val r = Curation.percentileGate(d, "score").collect()
    // 10 rows per label, top 30% → ranks 1..3 → 3 rows each
    assert(r.length === 6)
    val bySrc = r.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (_, rows) =>
      assert(rows.length === 3)
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // kept scores dominate: the highest scores in each label win
    assert(r.filter(_.getAs[String]("source") == "s0")
      .map(_.getAs[Long]("score")).sorted.toSeq === Seq(16L, 18L, 20L))
  }

  test("bpeMerges: argmax, tie-break and leftmost rewrite on a fixture") {
    // "a b" appears 3×, everything else less — round 1 merges (a, b).
    // Round 2: after rewrites the corpus is "a_b c" ×2, "a_b d", "x y":
    // (a_b, c) has 2, the rest 1 → merges (a_b, c).
    val docs = Seq("a b c", "a b c", "a b d", "x y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = Curation.bpeMerges(docs, rounds = 2).collect()
      .map(x => (x.getAs[Int]("round"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq((1, "a", "b", 3L), (2, "a_b", "c", 2L)))
  }

  test("bpeMerges counts overlapping pairs but rewrites non-overlapping") {
    // "a a a a": counting sees 3 adjacent (a, a) pairs. The rewrite is
    // leftmost non-overlapping on the SPACE-DELIMITED form — the match
    // " a a " consumes its trailing space, so only ONE merge lands:
    // "a_a a a". Round 2's pairs are then (a_a, a) and (a, a), tied at
    // 1 — "a a" < "a_a a" textually, so (a, a) merges again.
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val r = Curation.bpeMerges(docs, rounds = 2).collect()
      .map(x => (x.getAs[Int]("round"), x.getAs[String]("lhs"),
        x.getAs[String]("rhs"), x.getAs[Long]("cnt")))
    assert(r.toSeq === Seq((1, "a", "a", 3L), (2, "a", "a", 1L)))
  }

  test("bpeMerges stops early when no pair remains") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    assert(Curation.bpeMerges(docs, rounds = 3).collect().isEmpty)
  }

  test("bpeApply encodes with trained merges in order; savings are exact") {
    val docs = Seq("a b c", "a b c", "a b d", "x y")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Curation.bpeMerges(docs, rounds = 2).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    assert(merges === Seq(("a", "b"), ("a_b", "c")))
    val r = Curation.bpeApply(docs, merges).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_raw"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("saved_ppm")))
    assert(r.toSeq === Seq(
      (0L, 3L, 1L, 666666L), // "a b c" → "a_b_c"
      (1L, 3L, 1L, 666666L),
      (2L, 3L, 2L, 333333L), // "a b d" → "a_b d"
      (3L, 2L, 2L, 0L)))     // untouched
  }

  test("greedyCoverage: marginal-gain picks, ties to lowest id, dry rounds vanish") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles {a b c, b c d} — gain 2
      (2L, "a b c"),     // {a b c} — fully covered after pick 1
      (3L, "x y z w"))   // {x y z, y z w} — gain 2, loses the tie to 1
      .toDF("doc_id", "text")
    val r = graft.ops.Curation.greedyCoverage(docs, k = 3).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    // round 3 has no doc with uncovered shingles left → only 2 rows
    assert(r.toSeq === Seq((1, 1L, 2L), (2, 3L, 2L)))
  }

  test("proportionalSample: largest-remainder allocation hits the budget") {
    // strata sizes 6/3/1, budget 5: bases 3/1/0 (sum 4), remainders
    // 0/5/5 — the one leftover slot goes to 'b' (tie with 'c' broken
    // by label order). Realized sizes 3/2/0, total exactly 5.
    val docs = ((0 until 6).map(i => ("a", i.toLong)) ++
      (0 until 3).map(i => ("b", 100L + i)) ++
      Seq(("c", 200L))).toDF("source", "doc_id")
    val r = graft.ops.Curation.proportionalSample(docs, budget = 5L)
      .collect()
      .map(x => (x.getString(0), x.getInt(1), x.getLong(2), x.getLong(5)))
    assert(r.length === 5)
    assert(r.count(_._1 == "a") === 3 && r.count(_._1 == "b") === 2)
    assert(r.forall(_._4 > 0)) // k column reflects the allocation
    // winners are the smallest mix31(doc_id) per stratum
    def mix31(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      x ^= (x >> 15)
      x = (x * 1103515245L) & 0x7FFFFFFFL
      x ^ (x >> 12)
    }
    val wantA = (0 until 6).map(_.toLong).sortBy(i => (mix31(i), i)).take(3)
    assert(r.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq === wantA)
  }

  test("balancedShards: LPT deal and exact deviation report") {
    import org.apache.spark.sql.functions.col
    // token sizes 10,8,2,1 into 2 shards: descending deal → shard0
    // gets {10,2}=12, shard1 gets {8,1}=9; grand 21
    val docs = Seq((1L, Seq.fill(10)("w").mkString(" ")),
      (2L, Seq.fill(8)("w").mkString(" ")),
      (3L, "w w"), (4L, "w")).toDF("doc_id", "text")
    val r = Curation.balancedShards(docs, w = 2).collect()
      .map(x => (x.getAs[Long]("shard"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("tokens"), x.getAs[Long]("dev_ppm"))).toSeq
    assert(r === Seq((0L, 2L, 12L, 142857L), (1L, 2L, 9L, -142857L)))
  }

  test("negativeSamples: seeded draws resolve via dense rank, dups dropped") {
    import org.apache.spark.sql.functions.col
    def mix31(v: Long): Long = {
      var x = v & 0x7FFFFFFFL
      x ^= (x >> 15)
      x = (x * 1103515245L) & 0x7FFFFFFFL
      x ^ (x >> 12)
    }
    // sparse ids (rank ≠ id) prove the dense-rank resolution; doc 7 is
    // an exact-dup (post-normalization) of anchor 0
    val texts = Map(0L -> "alpha  beta", 3L -> "gamma", 7L -> "Alpha Beta",
      12L -> "delta", 20L -> "epsilon", 31L -> "zeta")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val ids = texts.keys.toSeq.sorted // rank r → ids(r)
    val r = Curation.negativeSamples(docs, k = 3, sampleMod = 10)
      .collect().map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("j"),
        x.getAs[Long]("neg_id"))).toSeq
    // replay every draw: anchors 0 and 20; dup (anchor 0 drawing 0 or
    // 7) and self-fingerprint draws vanish
    val want = for {
      a <- Seq(0L, 20L); j <- 1L to 3L
      neg = ids((mix31(a * 7 + j) % ids.length).toInt)
      if !(a == 0L && (neg == 0L || neg == 7L)) && !(a == 20L && neg == 20L)
    } yield (a, j, neg)
    assert(r === want)
    // rerun is identical (seeded end to end)
    val r2 = Curation.negativeSamples(docs, k = 3, sampleMod = 10)
      .collect().map(x => (x.getAs[Long]("anchor_id"), x.getAs[Long]("j"),
        x.getAs[Long]("neg_id"))).toSeq
    assert(r2 === r)
  }

  test("packingSweep: exact truncation/padding table at one length") {
    val d = Seq((0L, "a b c d"), (1L, "a b")).toDF("doc_id", "text")
    val r = Curation.packingSweep(d, lengths = Seq(3)).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("total_tokens") === 6L)
    assert(r.getAs[Long]("kept_tokens") === 5L)   // min(4,3) + 2
    assert(r.getAs[Long]("dropped_tokens") === 1L)
    assert(r.getAs[Long]("truncated_docs") === 1L)
    assert(r.getAs[Long]("dropped_ppm") === 166666L)
    assert(r.getAs[Long]("truncated_doc_ppm") === 500000L)
    assert(r.getAs[Long]("packed_seqs_lb") === 2L) // ceil(5/3)
    assert(r.getAs[Long]("naive_pad_ppm") === 166666L) // (6-5)/6
  }

  test("temperatureMixture: sqrt flattening moves share toward the small source") {
    val d = (Seq.fill(9)("big") ++ Seq("small")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val r = Curation.temperatureMixture(d, budget = 100L).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("weight_e3"), x.getAs[Long]("natural_ppm"),
          x.getAs[Long]("temp_ppm"), x.getAs[Long]("quota"))).toMap
    // √9e6 = 3000, √1e6 = 1000: 90/10 natural flattens to 75/25
    assert(r("big") === ((3000L, 900000L, 750000L, 75L)))
    assert(r("small") === ((1000L, 100000L, 250000L, 25L)))
  }

  test("losoQualityAblation: LOSO mean is exactly the other sources' mean") {
    val d = Seq((0L, "the a of and to in is", "sa"), // stopword-heavy
      (1L, "unique tokens every one here now", "sb"))
      .toDF("doc_id", "text", "source")
    val scores = graft.ops.TextAnalysis.qualityScore(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_micro"))
      .toMap
    val r = Curation.losoQualityAblation(d).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("loso_micro"), x.getAs[Long]("delta_micro"))).toMap
    val overall = (scores(0L) + scores(1L)) / 2
    assert(r("sa")._1 === scores(1L)) // without sa only doc 1 remains
    assert(r("sb")._1 === scores(0L))
    assert(r("sa")._2 === scores(1L) - overall)
    // single source: nothing remains when removed → NULL loso
    val one = Curation.losoQualityAblation(
      Seq((0L, "x y", "only")).toDF("doc_id", "text", "source")).collect()
    assert(one.head.isNullAt(one.head.fieldIndex("loso_micro")))
  }

  test("textClean: per-class counts, strip-and-collapse length, flag") {
    val d = Seq(
      (1L, "hello  world"),            // double space collapses
      (2L, "a\u0001b\u0002c"),         // two C0 controls, stripped
      (3L, "x\uFFFDy\uFFFDz"),         // two replacement chars
      (4L, "caf\u00C3\u00A9 ok"),      // mojibake pair — flagged, kept
      (5L, " tab\there ")              // tab is whitespace, not control
    ).toDF("doc_id", "text")
    val r = Curation.textClean(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_replacement"), x.getAs[Long]("n_control"),
          x.getAs[Long]("n_mojibake"), x.getAs[Long]("n_chars_clean"),
          x.getAs[Boolean]("is_clean"))).toMap
    assert(r(1L) === ((0L, 0L, 0L, 11L, true)))
    assert(r(2L) === ((0L, 2L, 0L, 3L, false)))
    assert(r(3L) === ((2L, 0L, 0L, 3L, false)))
    assert(r(4L) === ((0L, 0L, 1L, 8L, false)))
    assert(r(5L) === ((0L, 0L, 0L, 8L, true)))
  }

  test("ipfRaking: one sweep hits the column margin exactly on a 2x2") {
    // counts: (s1,en)=30 (s1,fr)=10 | (s2,en)=10 (s2,fr)=50; total
    // 100, targets 50/row and 50/col. Row factors: a(s1)=1.25e6,
    // a(s2)=833333 ppm. Row-adjusted col sums: en = 30·1.25e6 +
    // 10·833333 = 45.83e6 micro; fr = 10·1.25e6 + 50·833333 =
    // 54.17e6 micro. b = 50e12 // col_micro.
    val docs = (Seq.fill(30)(("s1", "en")) ++ Seq.fill(10)(("s1", "fr")) ++
      Seq.fill(10)(("s2", "en")) ++ Seq.fill(50)(("s2", "fr")))
      .zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "source", "lang")
    val r = graft.ops.Curation.ipfRaking(docs).collect()
      .map(x => (x.getAs[String]("src"), x.getAs[String]("lang")) -> x)
      .toMap
    val s1en = r(("s1", "en"))
    assert(s1en.getAs[Long]("a_ppm") === 1250000L)
    assert(r(("s2", "fr")).getAs[Long]("a_ppm") === 833333L)
    val colEn = 30L * 1250000 + 10L * 833333
    assert(s1en.getAs[Long]("b_ppm") === 50L * 1000000000000L / colEn)
    // the column sweep ran LAST, so the achieved column margin is the
    // target up to ppm truncation (within 100 micro-docs of 50·10⁶)
    val achieved = s1en.getAs[Long]("achieved_col_micro")
    assert(math.abs(achieved - 50000000L) < 100L,
      s"achieved=$achieved")
  }

  test("curriculumOrder: linear bands, easy-first in band, round-robin " +
      "interleave; a million-token doc can't collide ranks (hand-computed)") {
    // token counts: 1,2,3,4,5,8 — mx=8, bands=4, band = n*4 div 9:
    // n=1,2→0; n=3,4→1; n=5→2; n=8→3
    val d = Seq(
      (10L, "a"), (11L, "a b"), (12L, "a b c"), (13L, "a b c d"),
      (14L, "a b c d e"), (15L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = graft.ops.Curation.curriculumOrder(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("band"), x.getAs[Long]("band_rank"),
          x.getAs[Long]("curriculum_pos"))).toMap
    assert(r(10L) === ((0, 1L, 0L)))  // (1-1)*4+0
    assert(r(11L) === ((0, 2L, 4L)))  // (2-1)*4+0
    assert(r(12L) === ((1, 1L, 1L)))
    assert(r(13L) === ((1, 2L, 5L)))
    assert(r(14L) === ((2, 1L, 2L)))
    assert(r(15L) === ((3, 1L, 3L)))
    // the global order trends round-robin across bands: first window
    // (pos 0..3) holds one doc from EVERY band
    val firstWindow = r.values.filter(_._3 < 4).map(_._1).toSet
    assert(firstWindow === Set(0, 1, 2, 3))
  }

  test("canonicalUrl: ports, tracking params, fragments, param order, " +
      "malformed input (hand-computed edges)") {
    val d = Seq(
      (1L, "HTTPS://Ex.Com:443/A/b?z=2&utm_source=m&a=1#frag"),
      (2L, "http://ex.com:80?ref=x"),          // empty path -> '/'
      (3L, "http://ex.com:8080/p"),             // NON-default port kept
      (4L, "https://ex.com/p?fbclid=1&gclid=2"),// all params tracked
      (5L, "not a url at all"),                 // malformed: degrades
      (6L, "https://ex.com/p?a=1&b=2"),
      (7L, "https://EX.com:443/p?b=2&a=1#x"))   // canonical twin of 6
      .toDF("event_id", "url")
    val r = graft.ops.Curation.urlKeyDedup(d).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("canonical_url"), x.getAs[Long]("keeper_id"),
          x.getAs[Boolean]("is_dup")))).toMap
    assert(r(1L)._1 === "https://ex.com/A/b?a=1&z=2")
    assert(r(2L)._1 === "http://ex.com/")
    assert(r(3L)._1 === "http://ex.com:8080/p")
    assert(r(4L)._1 === "https://ex.com/p")
    assert(r(5L)._1 === ":///") // no scheme/host parse; never throws
    assert(r(6L) === (("https://ex.com/p?a=1&b=2", 6L, false)))
    assert(r(7L) === (("https://ex.com/p?a=1&b=2", 6L, true)))
  }

  test("canonicalUrl: percent-encoding normalization (RFC 3986 §6.2.2) " +
      "and fragment-hidden '?' (hand-computed edges)") {
    val d = Seq(
      (1L, "https://ex.com/p#f?x=1"),          // '?' inside fragment: NOT a query
      (2L, "https://ex.com/%7Ehome?x=%2fv"),   // %7E→'~'; %2f stays, hex uppercased
      (3L, "https://ex.com/%7ehome?x=%2Fv"),   // hex-case twin of 2
      (4L, "https://ex.com/p?%61=1"),          // %61→'a': decoded param NAME
      (5L, "https://ex.com/p?a=1"),            // plain twin of 4
      (6L, "https://ex.com/p?x=100%"),         // trailing '%': verbatim, no throw
      (7L, "https://ex.com/p?x=%G1"),          // bad hex: verbatim
      (8L, "https://ex.com/%41%5a?b=%30"))     // %41→A %5a→Z %30→0
      .toDF("event_id", "url")
    val r = graft.ops.Curation.urlKeyDedup(d).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[String]("canonical_url"), x.getAs[Long]("keeper_id"),
          x.getAs[Boolean]("is_dup")))).toMap
    assert(r(1L)._1 === "https://ex.com/p")
    assert(r(2L) === (("https://ex.com/~home?x=%2Fv", 2L, false)))
    assert(r(3L) === (("https://ex.com/~home?x=%2Fv", 2L, true)))
    assert(r(4L) === (("https://ex.com/p?a=1", 4L, false)))
    assert(r(5L) === (("https://ex.com/p?a=1", 4L, true)))
    assert(r(6L)._1 === "https://ex.com/p?x=100%")
    assert(r(7L)._1 === "https://ex.com/p?x=%G1")
    assert(r(8L)._1 === "https://ex.com/AZ?b=0")
  }

  test("canonicalUrl: trackingParamRegex is a parameter (site-specific " +
      "junk params beyond the default four)") {
    val out = Seq(Tuple1("https://ex.com/p?sid=9&a=1&utm_source=m"))
      .toDF("url")
      .select(graft.ops.Curation.canonicalUrl(
        org.apache.spark.sql.functions.col("url"),
        trackingParamRegex = "^(utm_[^=]*|sid)=").as("c"))
      .head().getString(0)
    assert(out === "https://ex.com/p?a=1")
    // and the default still only drops the documented four
    val def0 = Seq(Tuple1("https://ex.com/p?sid=9&a=1&utm_source=m"))
      .toDF("url")
      .select(graft.ops.Curation.canonicalUrl(
        org.apache.spark.sql.functions.col("url")).as("c"))
      .head().getString(0)
    assert(def0 === "https://ex.com/p?a=1&sid=9")
  }

  test("idnAsciiUrl punycodes ONLY the host: userinfo/port/path stay " +
      "byte-identical, ASCII hosts and non-URLs pass through") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "https://BÜCHER.example/p?x=1#f"),
      (2L, "http://user:pw@bücher.example:8080/p"),
      (3L, "https://plain.EXAMPLE.com/p"),
      (4L, "not a url"),
      (5L, null.asInstanceOf[String])).toDF("id", "url")
    val r = d.select(col("id"),
        graft.ops.Curation.idnAsciiUrl(col("url")).as("u"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "https://xn--bcher-kva.example/p?x=1#f")
    assert(r(2L) === "http://user:pw@xn--bcher-kva.example:8080/p")
    // ASCII labels skip nameprep (RFC 3490 step 2): case is
    // canonicalUrl's job, not the ingest encoder's
    assert(r(3L) === "https://plain.EXAMPLE.com/p")
    assert(r(4L) === "not a url")
    assert(r(5L) === null)
  }

  // ── robots.txt (RFC 9309) ───────────────────────────────────────────

  private def gate(body: String, agent: String, urls: (Long, String)*) = {
    val robots = Seq(("h.ex", body)).toDF("host", "body")
    val u = urls.map { case (id, p) => (id, s"https://h.ex$p") }
      .toDF("id", "url")
    Curation.robotsGate(u, Curation.parseRobots(robots), agent)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), if (r.isNullAt(4)) -1 else r.getInt(4))).toMap
  }

  test("robotsGate: longest match wins, allow beats disallow on ties") {
    val body = "User-agent: *\nDisallow: /p\nAllow: /p/x\n" +
      "Disallow: /a\nAllow: /a\n"
    val r = gate(body, "anybot",
      (1L, "/p/x/1"),   // allow /p/x (4) beats disallow /p (2)
      (2L, "/p/y"),     // only disallow /p matches
      (3L, "/a/z"),     // tie at len 2 → allow wins
      (4L, "/other"))   // no rule matches → allowed, no win_len
    assert(r(1L) === (true, 4))
    assert(r(2L) === (false, 2))
    assert(r(3L) === (true, 2))
    assert(r(4L) === (true, -1))
  }

  test("robotsGate: '$' anchors the end, '*' spans segments, the " +
      "match target includes the query") {
    val body = "User-agent: *\nDisallow: /f$\nDisallow: /*/secret\n" +
      "Disallow: /q?x=*\n"
    val r = gate(body, "anybot",
      (1L, "/f"),          // exact → blocked by /f$
      (2L, "/f/g"),        // $ anchor forbids prefix-only match
      (3L, "/a/secret"),   // wildcard spans the first segment
      (4L, "/secret"),     // /*/secret needs a segment before it
      (5L, "/q?x=1"),      // query is part of the match target
      (6L, "/q"))          // no query → pattern can't match
    assert(r(1L)._1 === false)
    assert(r(2L)._1 === true)
    assert(r(3L)._1 === false)
    assert(r(4L)._1 === true)
    assert(r(5L)._1 === false)
    assert(r(6L)._1 === true)
  }

  test("robotsGate: a specific-agent group suppresses '*', multi-UA " +
      "heads share rules, group repetition merges") {
    val body = "User-agent: graftbot\nUser-agent: otherbot\n" +
      "Disallow: /x\n\nUser-agent: *\nDisallow: /\n\n" +
      "User-agent: graftbot\nDisallow: /y\n"
    // graftbot: its own groups only (/x from the shared head, /y from
    // the second group) — the '*' Disallow-all never applies
    val g = gate(body, "GraftBot", (1L, "/x/1"), (2L, "/y"), (3L, "/z"))
    assert(g(1L)._1 === false)
    assert(g(2L)._1 === false)
    assert(g(3L)._1 === true)
    // an agent named in no group falls back to '*'
    val o = gate(body, "strangerbot", (1L, "/z"))
    assert(o(1L)._1 === false)
  }

  test("robotsGate: parse hygiene — comments, CRLF, mixed-case keys, " +
      "headless rules ignored, empty Disallow is no restriction, " +
      "hosts without robots pass") {
    val body = "Disallow: /headless\r\n" + // before any UA head: ignored
      "# lead comment\r\nUSER-AGENT: *\r\n" +
      "disallow: /c # trailing comment\r\nDisallow:\r\n"
    val r = gate(body, "anybot", (1L, "/c/1"), (2L, "/headless"), (3L, "/d"))
    assert(r(1L)._1 === false)   // mixed case + trailing comment parse
    assert(r(2L)._1 === true)    // headless rule never bound to a group
    assert(r(3L)._1 === true)    // empty Disallow ≠ disallow-everything
    // a host absent from the rules table is allowed everywhere
    val u = Seq((9L, "https://norobots.ex/any")).toDF("id", "url")
    val rules = Curation.parseRobots(Seq(("h.ex", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "body"))
    val out = Curation.robotsGate(u, rules, "anybot").collect()
    assert(out.length === 1 && out(0).getBoolean(3) === true)
    // a mixed-case robots host still meets the URL's lowercased
    // authority (parseRobots lowercases the key)
    val mixed = Curation.parseRobots(
      Seq(("H.Ex", "User-agent: *\nDisallow: /c\n")).toDF("host", "body"))
    val v = Curation.robotsGate(
      Seq((1L, "https://h.ex/c/1")).toDF("id", "url"), mixed, "anybot")
      .collect()
    assert(v.length === 1 && v(0).getBoolean(3) === false)
  }

  test("crawlDelays: named-agent groups beat '*', max of applicable " +
      "delays wins, malformed and inapplicable delays drop, and " +
      "frontierSchedule stretches only strides above H") {
    val robots = Seq(
      // graftbot named → its two groups apply (max 50), *'s 999 not
      ("a.ex", "User-agent: graftbot\nCrawl-delay: 30\n\n" +
        "User-agent: graftbot\nCrawl-delay: 50\n\n" +
        "User-agent: *\nCrawl-delay: 999\n"),
      ("b.ex", "User-agent: *\nCrawl-delay: 7\n"),      // via wildcard
      ("c.ex", "User-agent: *\nCrawl-delay: oops\n"),   // malformed
      ("d.ex", "User-agent: other\nCrawl-delay: 99\n"), // inapplicable
      ("e.ex", "User-agent: *\nCrawl-delay: 0\n"))      // non-positive
      .toDF("host", "body")
    val d = Curation.crawlDelays(robots, "graftbot").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("a.ex" -> 50L, "b.ex" -> 7L))
    // schedule over 2 hosts (H=2): a.ex stride max(2,50)=50, b.ex's
    // 7... both hosts delayed here, so use a third undelayed host
    val urls = Seq(
      (1L, "a.ex"), (2L, "a.ex"), (3L, "z.ex"), (4L, "z.ex"))
      .toDF("id", "host")
    val sched = Curation.frontierSchedule(urls, "host", "id",
        delays = Some(Curation.crawlDelays(robots, "graftbot")))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // H=2; a.ex host_index 0 stride 50 → 0, 50; z.ex host_index 1
    // stride 2 → 1, 3
    assert(sched === Map(1L -> 0L, 2L -> 50L, 3L -> 1L, 4L -> 3L))
  }

  test("crawlerTraps: digit/hex/mixed segments collapse to a template " +
      "in check order; the distinct-URL count per template flags traps") {
    val urls = Seq(
      (1L, "https://ex.com/cal/2024/01"),
      (2L, "https://ex.com/cal/2024/02"),
      (3L, "https://ex.com/cal/2025/07"),
      (4L, "https://ex.com/cal/2024/01?x=1"),     // distinct canonical
      (5L, "https://ex.com/item/deadbeef01"),     // ≥8 hex → <h>
      (6L, "https://ex.com/item/deadbeef02"),
      (7L, "https://ex.com/v2news"),              // digit-bearing → <x>
      (8L, "https://ex.com/about")).toDF("id", "url")
    val r = Curation.crawlerTraps(urls, minUrls = 3).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getBoolean(3))).toMap
    assert(r("ex.com/cal/<n>/<n>") === ((3L, 4L, true)))
    // digits-only wins over long-hex: 2024 is <n>, never <h>
    assert(!r.contains("ex.com/cal/<h>/<n>"))
    assert(r("ex.com/item/<h>") === ((2L, 2L, false)))
    assert(r("ex.com/<x>") === ((1L, 1L, false)))
    assert(r("ex.com/about") === ((1L, 1L, false)))
  }

  test("trapGate: frontier URLs on a flagged template drop; everything " +
      "else passes with original columns intact") {
    val urls = Seq(
      (1L, "https://ex.com/cal/2024/01"),
      (2L, "https://ex.com/cal/2024/02"),
      (3L, "https://ex.com/cal/2025/07"),
      (4L, "https://ex.com/about"),
      (5L, "https://ex.com/item/deadbeef01")).toDF("id", "url")
    val traps = Curation.crawlerTraps(urls, minUrls = 3)
    val kept = Curation.trapGate(urls, traps).collect()
      .map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(4L, 5L))
    assert(Curation.trapGate(urls, traps).columns.toSeq ===
      Seq("id", "url"))
    // a caller frame already carrying `host` (every frontier does)
    // comes through with ITS values — the gate's internal template
    // derivation must never shadow caller columns
    val withHost = urls.withColumn("host",
      org.apache.spark.sql.functions.lit("caller-value"))
    val gated = Curation.trapGate(withHost, traps).collect()
    assert(gated.map(_.getLong(0)).sorted.toSeq === Seq(4L, 5L))
    assert(gated.forall(_.getAs[String]("host") === "caller-value"))
  }

  test("blocklistGate: gates by host-label suffix and stays unambiguous " +
      "when the caller frame itself carries a domain column") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "ok.site.com", "mine"),
      (2L, "sub.tracker.net", "mine"),
      (3L, "tracker.net", "mine"),
      (4L, "tracker.net.evil", "mine"))
      .toDF("id", "host", "domain")           // caller's own `domain`
    val bl = Seq("tracker.net").toDF("domain")
    val out = Curation.blocklistGate(rows, bl, col("host")).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(1L, 4L))
    // the caller's domain column survives untouched
    assert(out.forall(_.getAs[String]("domain") === "mine"))
    assert(Curation.blocklistGate(rows, bl, col("host")).columns.toSeq ===
      Seq("id", "host", "domain"))
  }

  test("blocklistGate / frontierSchedule: hosts are case-insensitive — " +
      "a mixed-case probe host neither bypasses the blocklist nor " +
      "loses its crawl-delay stride") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "Sub.Tracker.NET"), (2L, "ok.site.com"))
      .toDF("id", "host")
    val bl = Seq("tracker.net").toDF("domain")
    assert(Curation.blocklistGate(rows, bl, col("host"))
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    // frontierSchedule: delay lookup matches case-insensitively on
    // both sides, but the output host column keeps the caller's case
    val urls = Seq((1L, "A.ex"), (2L, "A.ex"), (3L, "z.ex"), (4L, "z.ex"))
      .toDF("id", "host")
    val delays = Seq(("a.EX", 50L)).toDF("host", "crawl_delay")
    val sched = Curation.frontierSchedule(urls, "host", "id",
        delays = Some(delays)).collect()
    assert(sched.map(r => r.getLong(0) -> r.getLong(4)).toMap ===
      Map(1L -> 0L, 2L -> 50L, 3L -> 1L, 4L -> 3L))
    assert(sched.map(_.getString(1)).toSet === Set("A.ex", "z.ex"))
  }

  test("parseRobots: a Crawl-delay line between two User-agent lines " +
      "ends the group head — the later Disallow binds to the second " +
      "agent only (Google-parser semantics, pinned)") {
    val robots = Seq(("h.ex",
      "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"))
      .toDF("host", "body")
    val rules = Curation.parseRobots(robots)
    val u = Seq((1L, "https://h.ex/x/1")).toDF("id", "url")
    // agent b: gets the Disallow
    val rb = Curation.robotsGate(u, rules, "b").collect()
    assert(rb.length === 1 && rb(0).getBoolean(3) === false)
    // agent a: its group head ended at the Crawl-delay — /x unbound
    val ra = Curation.robotsGate(u, rules, "a").collect()
    assert(ra.length === 1 && ra(0).getBoolean(3) === true)
    // and the Crawl-delay itself still binds to agent a
    val d = Curation.crawlDelays(robots, "a").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("h.ex" -> 1L))
  }

  test("paramRelevance: a param whose value never moves the content " +
      "within any context is irrelevant; one that does is not") {
    val f = Seq(
      ("https://ex.com/p/a?page=1&sess=x", "a1"),
      ("https://ex.com/p/a?page=1&sess=y", "a1"),   // sess flips, content no
      ("https://ex.com/p/a?page=2&sess=x", "a2"),   // page flips, content yes
      ("https://ex.com/p/a?page=2&sess=y", "a2"),
      ("https://ex.com/p/b?lone=1", "b"))           // single-valued: no testimony
      .toDF("url", "content_hash")
    val r = Curation.paramRelevance(f).collect()
      .map(x => x.getString(1) -> (x.getLong(2), x.getLong(3),
        x.getLong(4), x.getBoolean(5))).toMap
    // sess: 2 contexts (page=1, page=2), both multi-value, none varying
    assert(r("sess") === ((2L, 2L, 0L, true)))
    // page: 2 contexts (sess=x, sess=y), both multi-value, both varying
    assert(r("page") === ((2L, 2L, 2L, false)))
    // lone: one context, never multi-value → no testimony → NOT irrelevant
    assert(r("lone") === ((1L, 0L, 0L, false)))
  }

  // ── priority sampling ───────────────────────────────────────────────

  /** The VecKernels.mix31 kernel, restated for an independent expected
    * value (4 lines — keeping the spec self-contained beats exposing
    * the private kernel).
    */
  private def mix31(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x ^= (x >> 15)
    x = (x * 1103515245L) & 0x7FFFFFFFL
    x ^ (x >> 12)
  }

  test("prioritySample: DLT priorities, threshold = (k+1)-th, " +
      "adjusted weight = max(w, tau), tau = 0 on small strata") {
    // weights = token counts 1..5; priorities derive from mix31(id)
    val d = docs(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"),
      (4L, "a b c d", "s"), (5L, "a b c d e", "s"),
      (10L, "x y z", "t"))               // stratum of 1 < k
    val out = Curation.prioritySample(d, k = 2).collect()
    val exp = Seq(1L, 2L, 3L, 4L, 5L).map { id =>
      val w = id.toDouble // weight == id for these fixtures
      (id, w * 2147483648.0 / (mix31(id) + 1).toDouble)
    }.sortBy(-_._2)
    val s = out.filter(_.getString(0) == "s")
    assert(s.map(_.getLong(2)).toSeq === exp.take(2).map(_._1))
    assert(s.map(r => r.getDouble(4)).toSeq === exp.take(2).map(_._2))
    // tau is the 3rd-highest priority; adj = max(weight, tau)
    val tau = exp(2)._2
    assert(s.forall(r => r.getDouble(5) === tau))
    assert(s.forall(r =>
      r.getDouble(6) === math.max(r.getLong(3).toDouble, tau)))
    // the 1-doc stratum: rank 1, tau 0, adj = own weight
    val t = out.filter(_.getString(0) == "t")
    assert(t.map(r => (r.getInt(1), r.getLong(2), r.getDouble(5),
      r.getDouble(6))).toSeq === Seq((1, 10L, 0.0, 3.0)))
  }

  test("recrawlPriority: change rate = hash flips over span, " +
      "priority = rate x age, now = the history's own max ts") {
    import java.sql.Timestamp
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 0$h%02d:00:00")
    val hist = Seq(
      (10L, ts(0), "x"), (10L, ts(1), "y"), (10L, ts(2), "y"),
      (20L, ts(3), "z"))
      .toDF("url_key", "ts", "content_hash")
    val out = Curation.recrawlPriority(hist, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // url 10: 1 flip over 7200s -> 500000 ppm/hr; 3600s stale ->
    // priority 500000. url 20: single fetch -> rate 0, age 0.
    assert(out.toSeq === Seq(
      (10L, 3L, 1L, 7200L, 3600L, 500000L, 500000L),
      (20L, 1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("lengthBucketPlan: equal-frequency boundaries, first-covering " +
      "assignment, exact padding waste; heavy lengths leave a ragged " +
      "plan") {
    // lens 1..4, B=2 → boundaries (2, 4); waste 1 per bucket;
    // baseline = 4·4 − 10 = 6
    val d = docs(
      (1L, "a", "s"), (2L, "a b", "s"),
      (3L, "a b c", "s"), (4L, "a b c d", "s"))
    val out = Curation.lengthBucketPlan(d, buckets = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1, 2L, 2L, 3L, 1L, 6L),
      (2, 4L, 2L, 7L, 1L, 6L)))
    // all docs one length → every boundary collapses onto it, the
    // first bucket takes everything, later buckets are EMPTY rows
    val same = docs((1L, "x y", "s"), (2L, "p q", "s"), (3L, "r s", "s"))
    val ragged = Curation.lengthBucketPlan(same, buckets = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(ragged.toSeq === Seq((1, 2L, 3L, 0L)))
  }

  // ── sliding-window chunking ─────────────────────────────────────────

  test("chunkWindows: stride overlap, remainder tail, short doc = one " +
      "window, stride = width degenerates to chunkTokens") {
    val d = docs(
      (1L, (1 to 12).map(i => s"w$i").mkString(" "), "s"),
      (2L, "a b c", "s"))
    val out = Curation.chunkWindows(d, width = 8, stride = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 0, 0L, 8L, (1 to 8).map(i => s"w$i").mkString(" ")),
      (1L, 1, 5L, 7L, (6 to 12).map(i => s"w$i").mkString(" ")),
      (2L, 0, 0L, 3L, "a b c")))
    // stride = width reproduces the fixed-width chunker rows
    val fw = Curation.chunkWindows(d, width = 5, stride = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    val ct = Curation.chunkTokens(d, width = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    assert(fw.toSeq === ct.toSeq)
  }

  test("canonical_url: bad arguments fail TYPED at analysis — never a " +
      "task-side ClassCastException (non-string input), constructor " +
      "throw (non-foldable regex), or NPE (null regex literal)") {
    import org.apache.spark.sql.AnalysisException
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.graft.ColumnBridge
    val d = Seq((1L, "https://ex.com/p")).toDF("event_id", "url")
    val e1 = intercept[AnalysisException] {
      d.select(ColumnBridge.column(graft.functions.CanonicalizeUrl(
        ColumnBridge.expression(col("event_id")), Literal("^x="))))
        .collect()
    }
    assert(e1.getMessage.contains("canonical_url"))
    val e2 = intercept[AnalysisException] {
      d.select(ColumnBridge.column(graft.functions.CanonicalizeUrl(
        ColumnBridge.expression(col("url")),
        ColumnBridge.expression(col("url"))))).collect()
    }
    assert(e2.getMessage.contains("foldable"))
    val e3 = intercept[AnalysisException] {
      d.select(ColumnBridge.column(graft.functions.CanonicalizeUrl(
        ColumnBridge.expression(col("url")),
        Literal(null, org.apache.spark.sql.types.StringType)))).collect()
    }
    assert(e3.getMessage.contains("null"))
  }
}

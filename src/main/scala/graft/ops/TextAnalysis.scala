package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: quality scoring,
  * language ID, token counting, fingerprinting. All map-only column
  * programs — no shuffles except the final dedup-group aggregations —
  * and all expressible in portable SQL so they're oracle-checkable.
  */
object TextAnalysis {

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "los", "y", "en", "es")
  val FrStop: Seq[String] = Seq("le", "la", "de", "les", "et", "en", "est")

  private def stopHits(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(stops)))

  /** Quality metrics per document: char/word/unique-word counts,
    * stopword count, type-token ratio as the quality proxy.
    */
  def quality(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(words).as("n_words"),
      size(array_distinct(words)).as("n_uniq"),
      stopHits(words, EnStop).as("stop_cnt"))
      .withColumn("ttr", col("n_uniq").cast("double") / col("n_words"))
      .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_words"))
      .orderBy("doc_id")
  }

  /** Linear quality classifier at SERVING shape: a fixed
    * integer-weight dot product over exact count features —
    * `score_micro = wTtr·ttr_ppm + wStop·stop_ppm + wLen·len_term`
    * with `len_term = min(n_words, 100)·10⁴` (length evidence
    * saturating at 100 words) — and a keep threshold. This is the
    * form a trained quality model (fastText/logreg distilled to a
    * linear head) takes in a pipeline: the WEIGHTS are data, the
    * operator is the codegen'd dot product + threshold, and because
    * every term is exact integer arithmetic the classifier is
    * bit-reproducible in any engine (no sigmoid — monotone, so the
    * threshold moves instead).
    *
    * The scoring is map-only (projection pushes to the scan); the
    * trailing orderBy is presentation for the oracle gate — drop it
    * in a pipeline and nothing shuffles. The default weights are
    * hand-calibrated for the fixture corpus's range, not learned.
    */
  def qualityScore(docs: DataFrame, wTtr: Int = 3, wStop: Int = 2,
      wLen: Int = 1, thresholdMicro: Long = 2400000L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    // Curation.ppmFloor carries the exactness proof (and the
    // negative-numerator caveat) — one definition, not a drifted copy
    def ppm(num: Column, den: Column): Column = Curation.ppmFloor(num, den)
    docs.select(col(idCol).as("doc_id"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_uniq"),
        stopHits(words, EnStop).cast("long").as("stop_cnt"))
      .withColumn("ttr_ppm", ppm(col("n_uniq"), col("n_words")))
      .withColumn("stop_ppm", ppm(col("stop_cnt"), col("n_words")))
      .withColumn("len_term", least(col("n_words"), lit(100L)) * 10000L)
      .withColumn("score_micro", col("ttr_ppm") * wTtr +
        col("stop_ppm") * wStop + col("len_term") * wLen)
      .withColumn("keep", col("score_micro") >= thresholdMicro)
      .select("doc_id", "ttr_ppm", "stop_ppm", "len_term", "score_micro", "keep")
      .orderBy("doc_id")
  }

  /** N-gram-free language ID heuristic: stopword-list voting with a
    * deterministic argmax (ties broken by list order en > es > fr,
    * 'und' when no list scores). A real model slots in behind the same
    * column contract.
    */
  def langId(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = split(col(textCol), " ")
    val sEn = stopHits(words, EnStop)
    val sEs = stopHits(words, EsStop)
    val sFr = stopHits(words, FrStop)
    docs.select(col(idCol).as("doc_id"),
        sEn.as("s_en"), sEs.as("s_es"), sFr.as("s_fr"))
      .withColumn("lang_pred",
        when(col("s_en") === 0 && col("s_es") === 0 && col("s_fr") === 0, "und")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation) — the standard
    * "how many tokens will this cost" estimator shape.
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("ws_tokens"),
      regexp_count(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).as("bpe_tokens"))
      .orderBy("doc_id")

  /** Polynomial rolling hash over the character stream (base-31,
    * mod 2^31-1): the classic Rabin-Karp document fingerprint, exact
    * and engine-portable (integer fold both sides). Distinguishes any
    * content change; pair with [[winnow]] for position-robust matching.
    */
  def rollingHash(textCol: Column): Column =
    aggregate(
      transform(split(textCol, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 2147483647L)

  def rollingHashes(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"), rollingHash(col(textCol)).as("rhash"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (the MOSS scheme): hash every character
    * k-gram, then keep the minimum hash of each window of w
    * consecutive k-grams — a position-robust fingerprint set whose
    * overlap survives local edits. Map-only per doc via the native
    * codegen'd `winnow_fp` kernel
    * ([[graft.functions.VecKernels.winnowFingerprints]]); k-gram
    * hashes are the engine-portable base-31 fold (q38 parity), so the
    * containment-search query (q56) verifies the whole scheme against
    * a relational oracle. The fingerprint set is the join key for
    * plagiarism-style containment search.
    */
  def winnow(docs: DataFrame, k: Int = 8, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    // per-char hashing over every k-gram is the compute-dense step —
    // spread input splits up to cluster slots first (single-file
    // parquet would otherwise run it on one task)
    Par.spread(docs).select(col(idCol).as("doc_id"),
        call_function("winnow_fp", col(textCol), lit(k), lit(w)).as("fingerprints"))
      .withColumn("n_fp", size(col("fingerprints")))
      .orderBy("doc_id")

  /** Interpreted HOF fold with identical semantics to [[winnow]]'s
    * kernel — the executable spec the native expression is
    * differential-tested against (VecExprSpec).
    */
  private[graft] def winnowFold(textCol: Column, k: Int, w: Int): Column = {
    val n = length(textCol)
    val gramHash = (i: Column) => aggregate(
      transform(split(textCol.substr(i, lit(k)), ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 2147483647L)
    val kgrams = transform(sequence(lit(1), greatest(n - (k - 1), lit(1))), gramHash)
    when(size(kgrams) >= w,
      array_distinct(transform(
        sequence(lit(0), size(kgrams) - w),
        j => array_min(slice(kgrams, j + lit(1), lit(w))))))
      .otherwise(array(array_min(kgrams)))
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase
    * text — the canonical near-exact dedup key (catches case and
    * spacing variants that `DocDedup.exact` misses).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        md5(lower(regexp_replace(col(textCol), "\\s+", " "))).as("fp"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .orderBy("keep_id")

  /** Corpus-statistical language-model quality score: train bigram
    * transition counts on the corpus itself, then score each document
    * by its mean transition probability in ppm —
    * `avg_b(count(b)·10⁶ // count(prefix(b)))` over the document's
    * bigram occurrences, all integer floor arithmetic (the rational
    * stand-in for mean log-likelihood: same ordering intent, no
    * transcendental, so the oracle verifies scores bit for bit).
    * Low scores = improbable word transitions = the boilerplate/
    * garbage a perplexity filter would cut.
    *
    * Scale shape: bigram and prefix counts are map-side-combinable
    * aggregates keyed by terms (the bigram dictionary ≪ corpus; AQE
    * broadcasts it back onto occurrences); the per-doc fold is one
    * doc-keyed aggregate. Documents under 2 tokens have no bigrams
    * and drop out — gate them with [[quality]]'s length rules.
    */
  def bigramLmScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val occ = Par.spread(docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
      .localCheckpoint() // occurrences feed two branches: materialize once
    val cb = occ.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    // c(w1) = Σ_w2 c(w1,w2): fold the (much smaller) bigram dictionary
    // instead of a second full pass over occurrences (guide §2.3 —
    // aggregate the aggregate, not the data); cb's two appearances in
    // the one plan share the exchange (ReusedExchange), no checkpoint
    val cp = cb.groupBy("w1").agg(sum("cb").as("cp"))
    occ.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .select(col("doc_id"), expr("(cb * 1000000) div cp").as("ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(ppm) div count(1)").as("lm_ppm"))
      .orderBy("doc_id")
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * standard LM smoothing every perplexity-style quality filter
    * rests on) in EXACT integer micro arithmetic:
    *
    *   P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
    *                 + λ(w1)·P_cont(w2)
    *   λ(w1)   = D·N1+(w1,·)/c(w1)
    *   P_cont  = N1+(·,w2) / |distinct bigrams|
    *
    * with discount `dMicro`/10⁶ (default the classic 0.75), every
    * division an integer floor in a FIXED order —
    * `term1 = (cb·10⁶ − dMicro)⁺ div cp`,
    * `term2 = ((dMicro·n1w div cp) · (n1c·10⁶ div nbd)) div 10⁶` —
    * so any engine replays the identical ppm. Unlike [[bigramLmScore]]
    * (raw MLE), unseen-in-context transitions score by their
    * continuation NOVELTY, the property that makes KN the default.
    * Per doc: `(doc_id, n_bigrams, kn_ppm)` where kn_ppm is the
    * floor-mean transition probability.
    *
    * Scale shape: identical to [[bigramLmScore]] — every dictionary
    * (cb, cp, N1+ left/right) is a term-keyed map-side-combinable
    * count; the distinct-bigram total is one scalar crossJoin; AQE
    * broadcasts the dictionaries back onto occurrences; the per-doc
    * fold is one doc-keyed aggregate.
    */
  def knBigramScore(docs: DataFrame, dMicro: Long = 750000L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dMicro >= 0 && dMicro <= 1000000L,
      s"dMicro wants 0..10^6, got $dMicro")
    val occ = Par.spread(docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
      .localCheckpoint() // occurrences feed four branches
    val cb = occ.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .localCheckpoint() // the bigram dictionary feeds four more
    // c(w1) = Σ_w2 c(w1,w2): derived from the dictionary, not a second
    // full occurrence pass (guide §2.3)
    val cp = cb.groupBy("w1").agg(sum("cb").as("cp"))
    val n1w = cb.groupBy("w1").agg(count(lit(1)).as("n1w"))
    val n1c = cb.groupBy("w2").agg(count(lit(1)).as("n1c"))
    val nbd = cb.agg(count(lit(1)).as("nbd"))
    occ.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .join(n1w, Seq("w1")).join(n1c, Seq("w2"))
      .crossJoin(broadcast(nbd))
      .select(col("doc_id"),
        (expr(s"greatest(cb * 1000000 - $dMicro, 0) div cp") +
          expr(s"(($dMicro * n1w div cp) * (n1c * 1000000 div nbd)) " +
            "div 1000000")).as("ppm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(ppm) div count(1)").as("kn_ppm"))
      .orderBy("doc_id")
  }

  /** Collocation extraction by integer lift: for each bigram with
    * support ≥ `minSupport`, `lift_ppm = T·c(w1,w2)·10⁶ //
    * (c1(w1)·c2(w2))` — how much more often the pair co-occurs than
    * its parts' positional frequencies predict (the rational PMI:
    * same ordering as pointwise mutual information without the log).
    * Top `k` by (lift desc, w1, w2). The phrase-mining table a
    * tokenizer-vocab builder reads to decide merges.
    *
    * Scale shape: three term-keyed map-side-combinable aggregates off
    * one materialized occurrence set; the final cut is TakeOrdered(k).
    */
  def collocations(docs: DataFrame, k: Int = 100, minSupport: Long = 5L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val occ = Par.spread(docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2")))
    // ONE pass over occurrences: every marginal (c1, c2, total) folds
    // from the bigram dictionary (Σ over the other key / over both),
    // so occ has a single consumer and needs no materialization
    // (guide §2.3 — aggregate the aggregate, not the data)
    val cAll = occ.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint() // feeds the cut + three marginal folds
    val c12 = cAll.where(col("c12") >= minSupport)
    val c1 = cAll.groupBy("w1").agg(sum("c12").as("c1"))
    val c2 = cAll.groupBy("w2").agg(sum("c12").as("c2"))
    val total = cAll.agg(sum("c12").as("t"))
    c12.join(c1, Seq("w1")).join(c2, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"),
        expr("(t * c12 * 1000000) div (c1 * c2)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Feature-hashing vectorizer (the hashing trick): each token maps
    * to a bucket in `[0, dim)` via the engine-portable base-37
    * polyhash whitened by mix31, and the sparse vector is the count
    * per (doc, bucket) — fixed dimensionality with NO vocabulary
    * table to build, broadcast, or keep consistent across runs, which
    * is the reason serving stacks hash instead of indexing. Map-only
    * until the one (doc, bucket)-keyed count aggregate; the hash is
    * exact integer arithmetic, so the whole vector is oracle-checkable
    * (same fold as q22's shingle hash).
    */
  def hashFeatures(docs: DataFrame, dim: Int = 256,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val tok = Par.spread(docs)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
    // base-37 polyhash over code points mod 2^31−1 — the q22 portable
    // string hash; then the non-linear mixer decorrelates buckets
    val h37 = expr(
      "aggregate(filter(split(w, ''), c -> c <> ''), 0L, " +
        "(a, c) -> (a * 37 + ascii(c)) % 2147483647)")
    tok.withColumn("bucket", pmod(Similarity.mix31Col(h37), lit(dim.toLong)))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("doc_id", "bucket")
  }

  /** Content-defined chunking (the LBFS/rsync/storage-dedup scheme)
    * plus chunk-level dedup statistics: a boundary falls after any
    * position whose trailing `w`-char rolling hash (the q38 base-31
    * fold, engine-portable) is ≡ 0 mod `divisor` — so boundaries
    * depend on CONTENT, not offsets, and an insertion early in a
    * document re-aligns within one chunk instead of shifting every
    * fixed-width block. Each doc's chunks are then counted against the
    * corpus-wide chunk-content frequency; output is per-doc chunk
    * count, duplicated-chunk count (content seen ≥ 2 times anywhere),
    * and the dedup ratio in ppm — the "how much would CDC dedup save"
    * report.
    *
    * Scale shape: chunking is map-only (per-doc HOFs, no shuffle);
    * the frequency count is one combinable aggregation keyed by chunk
    * content (at 100 TB: by xxhash64 of the chunk, and the join-back
    * carries only occ ≥ 2 contents — the boilerplate-removal shape).
    * Expected chunk length is `divisor` chars, so row fan-out is
    * n_chars/divisor per doc, independent of corpus size.
    */
  /** The pure chunking kernel behind [[cdcChunkStats]]: O(n)
    * incremental rolling-window form
    * `h ← ((h − c_out·31^{w−1})·31 + c_in) mod P` of the same base-31
    * window fold the oracle restates per position (a nested re-fold
    * per position would be O(n·w) interpreted HOF evals — measured
    * MINUTES per scan task at sf0.1). Property-tested equal to the
    * direct per-window re-fold (PropertySpecs), same
    * imperative-kernel contract as the Multimodal decoders.
    */
  private[graft] def cdcChunks(text: String, w: Int, divisor: Int): Seq[String] = {
    val P = 2147483647L
    val pw = (1 until w).foldLeft(1L)((x, _) => x * 31 % P)
    val n = text.length
    val bnds = scala.collection.mutable.ArrayBuffer(0)
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= w) h = ((h - text.charAt(i - w) * pw) % P + P) % P
      h = (h * 31 + text.charAt(i)) % P
      if (i + 1 >= w && h % divisor == 0) bnds += (i + 1)
      i += 1
    }
    if (bnds.last != n) bnds += n
    bnds.iterator.sliding(2).withPartial(false)
      .map { s => text.substring(s.head, s(1)) }
      .filter(_.nonEmpty)
      .toSeq
  }

  def cdcChunkStats(docs: DataFrame, w: Int = 16, divisor: Int = 64,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = Par.spread(docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          cdcChunks(text, w, divisor).map(c => (id, c))
        }
      }.toDF("doc_id", "chunk")
    val freq = chunks.groupBy("chunk").agg(count(lit(1)).as("occ"))
    chunks.join(freq, Seq("chunk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_ppm", expr("(dup_chunks * 1000000) div n_chunks"))
      .orderBy("doc_id")
  }

  /** BM25-shaped lexical retrieval, integer-exact: score every
    * document against a fixed term set and keep the top `k`. Two
    * principled substitutions make the classic formula engine-exact
    * (bit-identical on Spark and the relational oracle) while
    * preserving its shape:
    *   - the log idf becomes the RATIONAL idf
    *     `floor((N − df + 1)·10⁶ / (df + 1))` — same monotonicity in
    *     df (rarer term ⇒ larger weight), no libm;
    *   - the length norm `dl/avgdl` is quantized to per-mille:
    *     `dlr = floor(1000·dl·N / Σdl)` (≈1000 for an average-length
    *     doc), folded into the k1=1.2 / b=0.75 saturation by exact
    *     cross-multiplication:
    *     `tfpart = 88000·tf / (40000·tf + 12000 + 36·dlr)`.
    * Per-term contribution `floor(idf · 88000 · tf / (40000·tf +
    * 12000 + 36·dlr))`, doc score the sum.
    *
    * Scale shape: corpus totals (N, Σdl) are two scalars; term match
    * filters DURING the explode so only query-term postings survive
    * (the inverted-index slice, not the corpus); df is a combinable
    * aggregate over ≤ |terms| keys, broadcast back; top-k is a
    * TakeOrdered. Overflow headroom: idf·88000·tf needs
    * idf·tf < 10¹⁴ — at web scale cap df-1 terms (idf ≤ N·10⁶) or
    * drop idf to milli-units.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = Par.spread(docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("t"), size(toks).cast("long").as("dl")))
    // corpus stats ride the plan as a broadcast one-row cross join
    // instead of a driver head() action: one job fewer, one fewer
    // full pass over the corpus (the spread exchange is reused by
    // both consumers), identical integer arithmetic
    val stats = base.agg(count(lit(1)).as("nds"), sum(col("dl")).as("tot"))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("t")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(dfT), Seq("w"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        expr("((nds - df + 1L) * 1000000L) div (df + 1L)"))
      .withColumn("dlr", expr("(1000L * dl * nds) div tot"))
      .withColumn("contrib",
        expr("(idf_micro * 88000L * tf) div (40000L * tf + 12000L + 36L * dlr)"))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Train a multinomial Naive Bayes text model IN the engine: the
    * "model" is the (class, token) count table with Laplace-smoothed
    * likelihoods `(cnt+1)·10⁶ div (classTokens + |V|)` in floor-ppm
    * — counts and one division, nothing a SQL engine can't restate,
    * so training is oracle-exact end to end. Emits the top `k`
    * tokens per class (count-desc, token tie-break) — the model head
    * a scorer would broadcast.
    *
    * Shape: one combinable (class, token) count folds the corpus;
    * class totals and |V| are folds of that table; the per-class
    * top-k is the row_number ≤ k window that [[graft.plans.WindowTopKRewrite]]
    * turns into the bounded-heap aggregate — no per-class sort of
    * the vocabulary at scale.
    */
  def naiveBayesCounts(docs: DataFrame, classCol: String = "lang",
      textCol: String = "text", k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .where(col(classCol).isNotNull && col(textCol).isNotNull)
      .select(col(classCol).as("cls"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val ct = tok.groupBy("cls", "tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // totals, vocab and the head share it
    val clsTot = ct.groupBy("cls").agg(sum(col("cnt")).as("ct_total"))
    val vocab = ct.agg(countDistinct(col("tok")).as("v"))
    ct.join(broadcast(clsTot), "cls").crossJoin(broadcast(vocab))
      .withColumn("lik_ppm",
        expr("(cnt + 1) * 1000000 div (ct_total + v)"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cls").orderBy(col("cnt").desc, col("tok"))))
      .where(col("rn") <= k)
      .select("cls", "rn", "tok", "cnt", "lik_ppm")
      .orderBy("cls", "rn")
  }

  /** Inverted-index build: token → (document frequency, total term
    * frequency, the first `k` posting doc_ids). The postings head is
    * a row_number-over-(tok, doc_id) window that the engine's
    * WindowTopKRewrite turns into the bounded-heap partial aggregate
    * (`partial_topk_rows` in-plan) — per-token state is O(k) on the
    * map side, so a stopword with 10⁹ postings costs the same buffer
    * as a rare term; the full postings list is never materialized.
    * One (tok, doc_id) shuffle builds the postings table; stats and
    * the head share it via localCheckpoint.
    */
  def invertedIndex(docs: DataFrame, k: Int = 10, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"postings head must be positive, got $k")
    val post = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // stats + postings head share it
    val stats = post.groupBy("tok")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
    val head = post
      .withColumn("rn", row_number().over(
        Window.partitionBy("tok").orderBy("doc_id")))
      .where(col("rn") <= k)
      .groupBy("tok")
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    stats.join(head, "tok").orderBy("tok")
  }

  /** Vocabulary coverage curve (the Zipf audit a tokenizer budget is
    * sized from): for each target percentage, how many distinct
    * types — taken most-frequent-first — cover that share of the
    * corpus token mass. Shapes for scale: ONE (token) count fold with
    * map-side combine, the cumulative mass over the frequency-ranked
    * vocab axis via [[Par.prefixSum]]'s two-pass scan (never a
    * single-partition window over millions of types), targets and the
    * corpus total broadcast, and a 3-row final aggregate. The rank of
    * the covering type is recovered WITHOUT a row_number: it is
    * 1 + count(types whose cumulative mass falls short), so no second
    * global scan is needed.
    */
  def vocabCoverage(docs: DataFrame, targetsPct: Seq[Int] = Seq(50, 90, 99),
      textCol: String = "text"): DataFrame = {
    require(targetsPct.nonEmpty && targetsPct.forall(p => p >= 1 && p <= 100),
      s"targets must be percentages in [1,100], got $targetsPct")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("neg", -col("cnt"))
    val cum = Par.prefixSum(counts, Seq.empty, Seq("neg", "tok"),
      "cnt", "cum")
    val tot = counts.agg(sum(col("cnt")).as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    val targets = targetsPct.sorted.toDF("pct")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(targets))
      .groupBy("pct", "total_tokens", "vocab_size")
      .agg(
        (sum(when(col("cum") * 100 < col("pct") * col("total_tokens"),
          1L).otherwise(0L)) + 1L).as("types_needed"),
        min(when(col("cum") * 100 >= col("pct") * col("total_tokens"),
          col("cum"))).as("covered_tokens"))
      .select("pct", "types_needed", "covered_tokens", "total_tokens",
        "vocab_size")
      .orderBy("pct")
  }

  /** Heaps-law vocabulary growth curve: distinct types seen after
    * the first 10%, 20%, … of the corpus (by doc id order) — each
    * token charges its FIRST document, so the cumulative distinct
    * count at a checkpoint is just "tokens whose first doc is ≤ the
    * checkpoint boundary", one min-aggregate + one bounded
    * checkpoint fold. No prefix re-scan per checkpoint, no global
    * dedup state: the curve that says whether more data still buys
    * vocabulary (sub-linear growth bending flat ⇒ the tokenizer's
    * vocab is saturating).
    */
  def vocabGrowth(docs: DataFrame, checkpoints: Int = 10,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val firstDoc = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
      .localCheckpoint() // every checkpoint probes it
    val ids = docs.select(col(idCol).cast("long").as("doc_id"))
    val n = ids.count()
    // checkpoint i (1..checkpoints) holds ranks with ⌈r·c/n⌉ = i; its
    // boundary doc is the bucket max — robust for any n
    val bounds = Par.globalRowNumber(ids, Seq("doc_id"))
      .select(expr(s"(rownum * $checkpoints + ${n}L - 1) div ${n}L")
        .as("pct_x"), col("doc_id"))
      .groupBy("pct_x").agg(max(col("doc_id")).as("bound"))
    firstDoc.crossJoin(broadcast(bounds))
      .groupBy("pct_x", "bound")
      .agg(sum(when(col("first_doc") <= col("bound"), 1L).otherwise(0L))
        .as("types"))
      .select((col("pct_x") * (100L / checkpoints)).as("pct"),
        col("bound"), col("types"))
      .orderBy("pct")
  }

  /** Rank-biased precision (Moffat & Zobel) of the [[bm25TopK]]
    * ranking, with persistence p = 1/2 in EXACT pico units:
    * `RBP = (1−p)·Σ p^(r−1)·rel_r = Σ rel_r · 10¹² div 2^r` — the
    * retrieval-effectiveness metric that needs no log (nDCG's
    * `log₂(r+1)` is float; RBP at p=1/2 is pure integer), so the
    * score is oracle-exact. Relevance is containment of ALL query
    * terms (the conjunctive qrel a synthetic corpus supports);
    * `rbp_pico` is graded against the ideal ranking's
    * `ideal_pico` (all relevant docs first) as `nrbp_ppm`.
    * One ranking pass + one bounded per-rank fold.
    */
  def rbpEval(docs: DataFrame, terms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = docs.select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t"))
      .where(terms.map(t => array_contains(col("t"), t)).reduce(_ && _))
      .select(col("doc_id"), lit(1L).as("rel"))
      .localCheckpoint() // ranking join + ideal fold share it
    val ranked = bm25TopK(docs, terms, k, textCol, idCol)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .join(rel, Seq("doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val rbp = ranked.agg(
      count(lit(1)).as("n_ranked"),
      sum(col("rel")).as("n_rel_ranked"),
      sum(expr("rel * (1000000000000 div CAST(pow(2, rank) AS BIGINT))"))
        .as("rbp_pico"))
    val nRel = rel.count()
    val ideal = (1 to math.min(k, nRel.toInt))
      .map(r => 1000000000000L / (1L << r)).sum
    require(ideal > 0, s"rbpEval: no document contains all of $terms")
    rbp.select(col("n_ranked"), col("n_rel_ranked"),
        lit(nRel).as("n_rel_total"), col("rbp_pico"),
        lit(ideal).as("ideal_pico"),
        expr(s"rbp_pico * 1000000 div ${ideal}L").as("nrbp_ppm"))
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio's term-
    * selection half): retrieve the [[bm25TopK]] feedback set for the
    * query, then rank candidate expansion terms by how over-
    * represented they are in the feedback docs vs the corpus —
    * `lift = (fb_df/|fb|) / (df/N)` cross-multiplied exact
    * (`fb_df·N·10⁶ div (|fb|·df)`), original query terms and
    * singleton feedback terms excluded. The classic zero-training
    * retrieval-quality lever; the output IS the expanded query.
    *
    * Scale: the feedback set is ≤ k doc ids (broadcast semi-join);
    * corpus df is one combinable distinct-aggregate (shared with any
    * BM25 index build); candidate ranking tops out at the feedback
    * vocabulary.
    */
  def prfExpansion(docs: DataFrame, terms: Seq[String], kDocs: Int = 20,
      topTerms: Int = 10, minFbDf: Long = 2L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // feedback set is read twice (broadcast probe + its own count):
    // materialize the top-k rather than re-deriving the BM25 pipeline
    val fb = bm25TopK(docs, terms, kDocs, textCol, idCol)
      .select(col("doc_id")).localCheckpoint()
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("t"))
    val dw = base.select(col("doc_id"), explode(col("t")).as("w"))
      .where(col("w") =!= "").distinct()
      .localCheckpoint() // corpus df and feedback df share it
    // N and |feedback| as broadcast one-row scalars instead of two
    // driver count() actions (two jobs + an extra corpus scan saved;
    // same floor-division arithmetic)
    val nDf = base.agg(count(lit(1)).as("nn"))
    val kDf = fb.agg(count(lit(1)).as("kk"))
    val dfAll = dw.groupBy("w").agg(count(lit(1)).as("df"))
    val fbDf = dw.join(broadcast(fb), "doc_id")
      .groupBy("w").agg(count(lit(1)).as("fb_df"))
      .where(col("fb_df") >= minFbDf && !col("w").isin(terms: _*))
    fbDf.join(dfAll, "w")
      .crossJoin(broadcast(nDf)).crossJoin(broadcast(kDf))
      .select(col("w").as("term"), col("fb_df"), col("df").as("corpus_df"),
        expr("fb_df * nn * 1000000 div (kk * corpus_df)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("fb_df").desc, col("term"))
      .limit(topTerms)
  }

  /** Per-class precision/recall/F1 of [[langId]] against the
    * ground-truth `lang` column — the classifier eval report
    * (confusion-matrix marginals) in exact ppm, classes = everything
    * appearing as truth OR prediction (so a class the model never
    * predicts shows precision 0 over 0 → reported as 0, recall
    * honest). `f1_ppm = 2·p·r div (p + r)` with the 0/0 guard.
    * One |classes|²-bounded aggregate; marginals fold from the cells.
    */
  def langIdEval(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val cells = langId(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("truth")),
        "doc_id")
      .groupBy(col("truth"), col("lang_pred").as("pred"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // marginals and tp probes share it
    val classes = cells.select(col("truth").as("cls"))
      .union(cells.select(col("pred").as("cls"))).distinct()
    val truthTot = cells.groupBy(col("truth").as("cls"))
      .agg(sum(col("c")).as("n_truth"))
    val predTot = cells.groupBy(col("pred").as("cls"))
      .agg(sum(col("c")).as("n_pred"))
    val tp = cells.where(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("c").as("tp"))
    classes
      .join(truthTot, Seq("cls"), "left")
      .join(predTot, Seq("cls"), "left")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .withColumn("precision_ppm",
        when(col("n_pred") > 0, expr("tp * 1000000 div n_pred"))
          .otherwise(lit(0L)))
      .withColumn("recall_ppm",
        when(col("n_truth") > 0, expr("tp * 1000000 div n_truth"))
          .otherwise(lit(0L)))
      .withColumn("f1_ppm",
        when(col("precision_ppm") + col("recall_ppm") > 0,
          expr("2 * precision_ppm * recall_ppm div " +
            "(precision_ppm + recall_ppm)")).otherwise(lit(0L)))
      .orderBy("cls")
  }

  /** Split-calibrated threshold selection: on a seeded calibration
    * split, rank docs by [[qualityScore]] and pick the DEEPEST
    * score cutoff whose prefix precision (vs the `lang = posLang`
    * label) still meets `targetPrecisionPpm` — max recall at the
    * precision floor — then report the achieved precision/recall on
    * the held-out split at that cutoff. The honest way to pick a
    * classifier threshold: chosen on one split, graded on the other
    * (picking and grading on the same data overstates both
    * numbers).
    *
    * All rank/precision arithmetic is exact cross-multiplied ppm;
    * the descending-score prefix scan runs through the two-pass
    * no-single-partition primitives ([[Par.globalRowNumber]] for the
    * rank, [[Par.prefixSum]] for the cumulative positives), so the
    * calibration split needn't fit one task even when it's the whole
    * corpus.
    */
  def thresholdCalibration(docs: DataFrame,
      targetPrecisionPpm: Long = 500000L, posLang: String = "en",
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    import graft.ops.Similarity.mix31Col
    val scored = qualityScore(docs, textCol = textCol, idCol = idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .select(col("doc_id"), col("score_micro"),
        when(col("lang") === posLang, 1L).otherwise(0L).as("pos"),
        (mix31Col(col(idCol).cast("long")) % 2).as("split"))
      .localCheckpoint() // calibration ranking and eval share it
    val calBase = scored.where(col("split") === 0)
      .withColumn("neg", -col("score_micro"))
    val cal = Par.prefixSum(
      Par.globalRowNumber(calBase, Seq("neg", "doc_id"))
        .withColumnRenamed("rownum", "rnk"),
      Seq(), Seq("neg", "doc_id"), "pos", "cum_pos")
    val chosen = cal
      .where(col("cum_pos") * 1000000L >= lit(targetPrecisionPpm) * col("rnk"))
      .agg(max(col("rnk")).as("cal_rank"))
    val thr = chosen.join(cal.select(col("rnk").as("cal_rank"),
      col("score_micro").as("threshold_micro")), "cal_rank")
    val ev = scored.where(col("split") === 1)
    ev.crossJoin(broadcast(thr))
      .groupBy("cal_rank", "threshold_micro")
      .agg(count(lit(1)).as("eval_n"),
        sum(when(col("score_micro") >= col("threshold_micro"), 1L)
          .otherwise(0L)).as("eval_pred"),
        sum(when(col("score_micro") >= col("threshold_micro"),
          col("pos")).otherwise(0L)).as("eval_tp"),
        sum(col("pos")).as("eval_pos"))
      .select(col("cal_rank"), col("threshold_micro"), col("eval_n"),
        col("eval_pred"), col("eval_tp"),
        expr("CASE WHEN eval_pred > 0 THEN eval_tp * 1000000 div eval_pred"
          + " ELSE 0 END").as("eval_precision_ppm"),
        expr("CASE WHEN eval_pos > 0 THEN eval_tp * 1000000 div eval_pos"
          + " ELSE 0 END").as("eval_recall_ppm"))
  }

  /** Classifier reliability table: bin the [[qualityScore]] micro
    * score into fixed-width buckets and report, per bin, the count,
    * the mean score, and the empirical positive rate of a reference
    * label — the model-eval artifact (a calibration / reliability
    * diagram's data) a labeling pipeline publishes before trusting a
    * score threshold. Here the reference label is `lang = 'en'`
    * (the `documents` table carries ground-truth `lang`), i.e. "does
    * the en-stopword-weighted quality score actually separate
    * English?" — the same shape applies to any (score, label) pair.
    *
    * Fixed-width binning (not quantile) keeps the bin id a pure
    * per-row map — one combinable aggregate, no rank pass; bins are
    * `score_micro div binWidthMicro`, capped into `bins` buckets.
    * All arithmetic integer-exact (micro/ppm floors).
    */
  def calibrationTable(docs: DataFrame, bins: Int = 10,
      binWidthMicro: Long = 600000L, posLang: String = "en",
      textCol: String = "text", idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val scored = qualityScore(docs, textCol = textCol, idCol = idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang")),
        "doc_id")
      .select(
        least(expr(s"score_micro div ${binWidthMicro}L"), lit(bins - 1L))
          .as("bin"),
        col("score_micro"),
        when(col("lang") === posLang, 1L).otherwise(0L).as("pos"))
    scored.groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("score_micro")).as("ssum"),
        sum(col("pos")).as("pos"))
      .select(col("bin"), col("n"),
        expr("ssum div n").as("mean_score_micro"), col("pos"),
        expr("pos * 1000000 div n").as("pos_rate_ppm"))
      .orderBy("bin")
  }

  /** Tokenizer-fertility and encoding profile per language — the
    * corpus-planning table behind token budgets: how many whitespace
    * and BPE-ish tokens (q29's regex tokenizer) a language produces
    * per 100 characters, how many UTF-8 bytes a whitespace token
    * costs, and what share of characters is non-ASCII. Fertility
    * differences are why a fixed byte budget buys different token
    * counts per language; the non-ASCII share is the cheap encoding
    * sanity gate (a sudden jump = mojibake or a scraper bug).
    * Integer floor ratios; milli (e3) for per-token costs, ppm for
    * shares.
    *
    * Scale shape: one map-only projection then one combinable
    * aggregate to |langs| rows — a 100 TB corpus folds in a single
    * pass with counters only crossing the shuffle.
    */
  def fertilityProfile(docs: DataFrame, textCol: String = "text",
      langCol: String = "lang"): DataFrame =
    docs.where(col(langCol).isNotNull && col(textCol).isNotNull)
      .select(col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("chars"),
        octet_length(col(textCol)).cast("long").as("bytes"),
        size(split(col(textCol), " ")).cast("long").as("ws"),
        regexp_count(col(textCol),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).cast("long").as("bpe"),
        length(regexp_replace(col(textCol), "[^\\x00-\\x7F]", ""))
          .cast("long").as("ascii"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("chars"),
        sum(col("bytes")).as("bytes"), sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"), sum(col("ascii")).as("ascii_chars"))
      .select(col("lang"), col("n_docs"), col("chars"), col("ws_tokens"),
        col("bpe_tokens"),
        expr("ws_tokens * 100000 div nullif(chars, 0)").as("ws_per_100c_e3"),
        expr("bpe_tokens * 100000 div nullif(chars, 0)").as("bpe_per_100c_e3"),
        expr("bytes * 1000 div nullif(ws_tokens, 0)").as("bytes_per_ws_e3"),
        expr("(chars - ascii_chars) * 1000000 div nullif(chars, 0)")
          .as("non_ascii_ppm"))
      .orderBy("lang")

  /** Per-source curation funnel in ONE scan: how many documents each
    * source contributes, and how many survive each stacked gate —
    * length floor, target language, then the [[qualityScore]] linear
    * classifier (same weights/threshold, computed inline so the
    * funnel never re-scans) — plus the end-to-end yield in ppm. The
    * "where does my corpus die" dashboard a curation run reads before
    * blaming any single filter.
    *
    * Shape: stacked conditional sums inside one combinable groupBy —
    * a 100 TB corpus costs exactly one scan and a |sources|-row
    * shuffle, no per-gate passes, no joins.
    */
  def curationFunnel(docs: DataFrame, minChars: Long = 200L,
      lang: String = "en", thresholdMicro: Long = 2400000L,
      textCol: String = "text", srcCol: String = "source",
      langCol: String = "lang", charsCol: String = "n_chars"): DataFrame = {
    val words = split(col(textCol), " ")
    def ppm(num: Column, den: Column): Column = Curation.ppmFloor(num, den)
    val score =
      ppm(size(array_distinct(words)).cast("long"), size(words).cast("long")) * 3 +
      ppm(stopHits(words, EnStop).cast("long"), size(words).cast("long")) * 2 +
      least(size(words).cast("long"), lit(100L)) * 10000L
    val g1 = col(charsCol) >= minChars
    val g2 = g1 && col(langCol) === lang
    val g3 = g2 && score >= thresholdMicro
    def cnt(c: Column, as: String) =
      sum(when(c, 1L).otherwise(0L)).as(as)
    docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), cnt(g1, "pass_len"),
        cnt(g2, "pass_lang"), cnt(g3, "pass_quality"))
      .withColumn("yield_ppm",
        expr("pass_quality * 1000000 div n_docs"))
      .orderBy("source")
  }

  /** RAKE-lite keyword extraction over the corpus: candidate phrases
    * are maximal stopword-free word runs (capped at `maxPhraseLen` —
    * longer runs are boilerplate, not keyphrases), each word scores
    * `deg/freq` where `freq` counts its occurrences inside candidate
    * phrases and `deg` sums the lengths of the phrases it appears in
    * (so words that live in longer collocations outrank bare
    * high-frequency words), and a phrase scores the sum of its word
    * scores — exact micro-unit integers throughout. Distinct from
    * q95's collocations (adjacent-pair PMI) and q61's tf-idf
    * (per-doc term weighting): RAKE ranks multi-word PHRASES with a
    * corpus-global word graph.
    *
    * Scale shape: tokenize map-only; the phrase segmentation is a
    * per-doc running stopword count (window partitioned by doc); word
    * stats are one combinable groupBy over the token stream; the
    * score join broadcasts the |vocab|-sized stats table; final
    * ranking is a bounded top-k.
    */
  def rakeKeywords(docs: DataFrame, stops: Seq[String] = EnStop,
      maxPhraseLen: Int = 5, k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Par.spread(docs)
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")))
      .withColumnRenamed("col", "w")
      .where(length(col("w")) > 0)
      .withColumn("is_stop", col("w").isInCollection(stops))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val inPhrase = toks
      .withColumn("pid",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(byDoc))
      .where(!col("is_stop"))
      .select(col("doc_id"), col("pid"), col("pos"), col("w"))
      .localCheckpoint() // phrase table + word stats + score join share it
    val phrases = inPhrase.groupBy("doc_id", "pid")
      .agg(count(lit(1)).as("len"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, w))), s -> s.w)"),
          " ").as("phrase"))
      .where(col("len") <= maxPhraseLen)
    val kept = inPhrase.join(phrases.select("doc_id", "pid", "len"),
      Seq("doc_id", "pid"))
    val stats = kept.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .withColumn("score_micro", expr("deg * 1000000 div freq"))
    kept.join(broadcast(stats.select("w", "score_micro")), "w")
      .groupBy("doc_id", "pid")
      .agg(sum("score_micro").as("ps"))
      .join(phrases, Seq("doc_id", "pid"))
      .groupBy("phrase")
      .agg(max(col("len")).as("len"), count(lit(1)).as("occurrences"),
        max(col("ps")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(k)
  }

  /** Vocabulary-richness report per source: observed types and
    * tokens, singleton/doubleton counts, the bias-corrected Chao1
    * species-richness estimate `S + N1(N1−1)/(2(N2+1))` (how many
    * types the source WOULD show with infinite sampling) and the
    * Good–Turing unseen-mass estimate `N1/N` in ppm (the probability
    * the very next token is a never-seen type) — the pair of
    * estimators that tells a curation pass whether a source is
    * mined out or still paying. Exact integers; pairs with q242's
    * Heaps-law growth curve.
    *
    * Scale shape: tokenize map-only, one (source, word) count fold,
    * then a combinable per-source summary — nothing wider than the
    * vocab table ever shuffles.
    */
  def vocabularyRichness(docs: DataFrame, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    val wc = Par.spread(docs)
      .where(col(textCol).isNotNull && col(srcCol).isNotNull)
      .select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    wc.groupBy("source")
      .agg(count(lit(1)).as("types"), sum("c").as("tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("singletons"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("doubletons"))
      .select(col("source"), col("types"), col("tokens"),
        col("singletons"), col("doubletons"),
        expr("""types + singletons * (singletons - 1)
          div (2 * (doubletons + 1))""").as("chao1_est"),
        expr("singletons * 1000000 div tokens").as("gt_unseen_ppm"))
      .orderBy("source")
  }

  /** Per-document suffix-array ranks by prefix doubling — the
    * distributed construction behind exact substring dedup at corpus
    * scale (the suffix array is what "find every duplicated span ≥ L"
    * indexes, cf. training-set dedup à la Lee et al.). Round k sorts
    * suffixes by their first 2^k characters using only the PREVIOUS
    * round's ranks: rank2k(i) = dense_rank by (rankk(i), rankk(i+2^k)),
    * with 0 as the past-the-end sentinel (every real rank is ≥ 1, so
    * shorter-suffix-first falls out of the sort like byte-lex compare).
    * ⌈log₂ maxLen⌉ rounds total.
    *
    * Shape: both the `lead` and the `dense_rank` of every round are
    * windows PARTITIONED BY doc_id — so after the first shuffle the
    * rounds are per-partition sorts with no further exchange (Spark
    * reuses the child partitioning), and docs scale out horizontally.
    * No joins: the pos+2^k lookup is a `lead(rank, 2^k)`, not a
    * self-join. Rounds are localCheckpoint'd so the lineage doesn't
    * stack ⌈log₂ maxLen⌉ window plans. Returns (doc_id, n_suffixes,
    * rank_checksum = Σ pos·rank) — the checksum pins every rank
    * without shipping |text| rows per doc.
    */
  /** The Gopher words the per-doc stopword RULE requires (Rae et al.
    * 2021 §A1.1.2: "contains at least two of the following English
    * words") — distinct from [[EnStop]], which is a frequency list
    * for language voting, not a rule gate.
    */
  val GopherRequired: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule bundle (Rae et al. 2021 §A1.1.2) as one
    * map-only column program with PER-RULE verdicts — the form a
    * curation pipeline needs when it must explain WHY a document was
    * dropped, not just that it was:
    *
    *   - rule 0 `r_wc`: word count within `[minWords, maxWords]`;
    *   - rule 1 `r_mwl`: mean word length within
    *     `[minMwlPpm, maxMwlPpm]` micro-chars (`Σ word chars ·10⁶ /
    *     n_words`, exact integer floor);
    *   - rule 2 `r_sym`: symbol-to-word ratio (`#` and `…`
    *     occurrences per word) at most `maxSymPpm`;
    *   - rule 3 `r_alpha`: at least `minAlphaPpm` of words carry an
    *     alphabetic character;
    *   - rule 4 `r_stop`: at least `minStopHits` DISTINCT words from
    *     [[GopherRequired]] appear.
    *
    * `fail_mask` sets bit k for each failed rule k (0 = keep) — the
    * drop-reason histogram is then one `groupBy(fail_mask)` away.
    * Every metric is exact integer arithmetic (micro-unit floors via
    * [[Curation.ppmFloor]]'s proven-exact form), so the whole bundle
    * carries a full DuckDB oracle. Map-only: the projection pushes to
    * the scan, nothing shuffles but the presentation sort; at 100 TB
    * the bundle costs one pass over the text column.
    */
  def gopherRules(docs: DataFrame,
      minWords: Long = 20L, maxWords: Long = 1000L,
      minMwlPpm: Long = 3000000L, maxMwlPpm: Long = 10000000L,
      maxSymPpm: Long = 100000L, minAlphaPpm: Long = 800000L,
      minStopHits: Long = 2L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    gopherRulesUnsorted(docs, minWords, maxWords, minMwlPpm, maxMwlPpm,
      maxSymPpm, minAlphaPpm, minStopHits, textCol, idCol)
      .orderBy("doc_id")

  /** [[gopherRules]] minus the presentation sort — the bundle is a
    * pure per-row projection, so THIS form is legal over a stream in
    * any output mode (the streaming gate in
    * [[graft.streaming.StreamingPipeline.gopherGateStream]] wraps it).
    */
  def gopherRulesUnsorted(docs: DataFrame,
      minWords: Long = 20L, maxWords: Long = 1000L,
      minMwlPpm: Long = 3000000L, maxMwlPpm: Long = 10000000L,
      maxSymPpm: Long = 100000L, minAlphaPpm: Long = 800000L,
      minStopHits: Long = 2L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def ppm(num: Column, den: Column): Column = Curation.ppmFloor(num, den)
    def occurrences(of: String): Column =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), lit(of), lit("")))).cast("long")
    val words = split(col(textCol), " ")
    val base = Par.spread(docs)
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(words).cast("long").as("n_words"),
        aggregate(transform(words, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("word_chars"),
        (occurrences("#") + occurrences("…")).as("sym_cnt"),
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
          .as("alpha_cnt"),
        size(array_intersect(array_distinct(words),
          array(GopherRequired.map(lit): _*))).cast("long").as("stop_hits"))
      .withColumn("mwl_ppm", ppm(col("word_chars"), col("n_words")))
      .withColumn("sym_ppm", ppm(col("sym_cnt"), col("n_words")))
      .withColumn("alpha_ppm", ppm(col("alpha_cnt"), col("n_words")))
    val rules = Seq(
      col("n_words") >= minWords && col("n_words") <= maxWords,
      col("mwl_ppm") >= minMwlPpm && col("mwl_ppm") <= maxMwlPpm,
      col("sym_ppm") <= maxSymPpm,
      col("alpha_ppm") >= minAlphaPpm,
      col("stop_hits") >= minStopHits)
    val mask = rules.zipWithIndex.map { case (r, i) =>
      when(r, lit(0L)).otherwise(lit(1L << i))
    }.reduce(_ + _)
    base
      .withColumn("fail_mask", mask)
      .select((Seq("doc_id", "n_words", "mwl_ppm", "sym_ppm", "alpha_ppm",
        "stop_hits").map(col) :+ col("fail_mask") :+
        (col("fail_mask") === 0L).as("keep")): _*)
  }

  /** Wordpiece segmentation fertility by pure relational Viterbi —
    * the "how many pieces does a trained subword vocab spend on this
    * corpus" question (SentencePiece/WordPiece's operational side),
    * with NO UDF and no kernel: the per-word min-cost DP is a single
    * Catalyst `aggregate` fold over candidate spans.
    *
    *   - vocab: every single character plus the `topK` most frequent
    *     2..`maxPieceLen`-char grams of the (occurrence-weighted)
    *     word stream; piece cost = 1-based rank in (count desc,
    *     gram asc) order over that union — deterministic integers;
    *   - segmentation objective, per word: lexicographically minimize
    *     (total piece cost, piece count). Both fold through ONE
    *     encoded long (`cost·64 + pieces` — valid because words are
    *     capped at `maxWordLen` < 64 pieces), so the DP value is
    *     unique and tie-free even when segmentations tie;
    *   - words longer than `maxWordLen` are excluded everywhere
    *     (none exist in this corpus; the cap is what makes the
    *     encoding exact).
    *
    * Output per doc: `(doc_id, n_words, total_cost, n_pieces)` —
    * n_pieces/n_words is the tokenizer-fertility the packing ops
    * budget with.
    *
    * Scale shape: the DP runs once per DISTINCT word (the corpus
    * word stream only feeds two map-combinable counts and the final
    * per-doc sum); candidate spans join the vocab by broadcast (top-K
    * + alphabet — bounded); the top-K itself is TakeOrdered, never a
    * global sort. The only single-partition window ranks the bounded
    * vocab union — planning-table-sized by construction.
    */
  def wordpieceFertility(docs: DataFrame, topK: Int = 512,
      maxPieceLen: Int = 4, maxWordLen: Int = 32,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Par.spread(docs)
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 1 && length(col("word")) <= maxWordLen)
      .localCheckpoint()
    val wc = words.groupBy("word").agg(count(lit(1)).as("wcnt"))
      .withColumn("len", length(col("word")))
    // occurrence-weighted gram counts, from the distinct-word table
    val spans = wc.select(col("word"), col("wcnt"), col("len"),
        explode(sequence(lit(0), col("len") - 1)).as("s"))
      .select(col("word"), col("wcnt"), col("len"), col("s"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("len") - col("s")))).as("l"))
      .withColumn("piece", expr("substring(word, s + 1, l)"))
    val gramCnt = spans.groupBy("piece")
      .agg(sum(col("wcnt")).as("cnt"))
    val singles = gramCnt.where(length(col("piece")) === 1)
    val multi = gramCnt.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(topK)
    val vocab = singles.union(multi)
      .withColumn("cost", row_number()
        .over(Window.orderBy(col("cnt").desc, col("piece"))).cast("long"))
      .select("piece", "cost")
    val cands = spans
      .join(broadcast(vocab), Seq("piece"))
      .groupBy("word", "len")
      .agg(collect_list(struct((col("s") + col("l")).as("e"),
        col("s"), col("cost"))).as("cands"))
    // the Viterbi fold: dp[0] = 0; dp[i] = min over spans ending at i
    // of dp[start] + cost·64 + 1 (encoded lexicographic objective).
    // Every position has its single-char span — the vocab contains
    // every character of every kept word by construction — so the
    // inner array_min is never over an empty array.
    val dp = cands.withColumn("combined",
      element_at(
        aggregate(
          sequence(lit(1), col("len")),
          array(lit(0L)),
          (acc, i) => concat(acc, array(
            array_min(transform(
              filter(col("cands"), c => c.getField("e") === i),
              c => element_at(acc, c.getField("s").cast("int") + 1)
                + c.getField("cost") * 64L + 1L)))),
          acc => acc),
        -1))
      .select("word", "combined")
    val perDoc = words.join(dp, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("combined div 64")).as("total_cost"),
        sum(expr("combined % 64")).as("n_pieces"))
    Par.spread(docs).where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id")).distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("total_cost"), lit(0L)).as("total_cost"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .orderBy("doc_id")
  }

  def suffixArrayChecksum(docs: DataFrame, maxLen: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = Window.partitionBy("doc_id")
    val byPos = perDoc.orderBy("pos")
    // round 0 ranks a WIDE prefix directly: dense_rank over the raw
    // k0-char substring IS rank_k0 (UTF-8 byte order = codepoint
    // order, and "shorter prefix sorts first" matches the doubling
    // recursion's 0-sentinel), so the first ⌈log₂ k0⌉ doubling rounds
    // — each a checkpoint + two windows + a fixpoint probe — never
    // run. On real text ranks are distinct around k≈16, so k0=32
    // usually makes round 0 the ONLY window round (was 5-6 rounds).
    val k0 = 32
    var df = Par.spread(docs)
      .where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        substring(col(textCol), 1, maxLen).as("t"))
      .withColumn("pos", explode(sequence(lit(1), length(col("t")))))
      .withColumn("rank",
        dense_rank().over(perDoc.orderBy(expr(s"substring(t, pos, $k0)")))
          .cast("long"))
      .select(col("doc_id"), col("pos"), col("rank"))
      .localCheckpoint()
    var k = k0
    var distinct = df.groupBy("doc_id")
      .agg(max("rank").as("m"), count(lit(1)).as("c"))
      .where(col("m") =!= col("c")).limit(1).count() == 0
    while (k < maxLen && !distinct) {
      df = df
        .withColumn("r2", lead(col("rank"), k, 0L).over(byPos))
        .withColumn("rank",
          dense_rank().over(perDoc.orderBy("rank", "r2")).cast("long"))
        .select(col("doc_id"), col("pos"), col("rank"))
        .localCheckpoint()
      k *= 2
      // early exit: once every doc's ranks are a permutation (max ==
      // count), later rounds are identity — on real text that happens
      // around k≈16, not maxLen. The check reads the checkpoint just
      // materialized, so it costs one cheap aggregate, and it can
      // never fire early-wrong: unique ranks are a fixpoint of the
      // doubling step.
      distinct = df.groupBy("doc_id")
        .agg(max("rank").as("m"), count(lit(1)).as("c"))
        .where(col("m") =!= col("c")).limit(1).count() == 0
    }
    df.groupBy("doc_id")
      .agg(count(lit(1)).as("n_suffixes"),
        sum(col("pos") * col("rank")).as("rank_checksum"))
      .orderBy("doc_id")
  }

  /** Within-document repetition signals — the Gopher/MassiveText
    * repetition-removal rules (Rae et al. 2021 §A1.1) in their
    * word-denominated form (the synthetic corpus has no line
    * structure, so fractions are over WORDS, not characters —
    * documented twin, same monotone signals):
    *   - `top_word_ppm`: count of the most frequent word / n_words —
    *     the C4-style "one token dominates" signal
    *   - `top_bigram_ppm`: words covered by occurrences of the most
    *     frequent word 2-gram (count × 2) / n_words; overlapping
    *     occurrences double-count, so pathological runs ("a a a a")
    *     can exceed 1e6 — by design, they are exactly what the rule
    *     kills
    *   - `dup_bigram_ppm`: words covered by ALL occurrences of
    *     repeated 2-grams (Σ count × 2 over grams with count ≥ 2) /
    *     n_words
    * `keep` = all three at-or-under their thresholds. All floor
    * divisions, engine-portable.
    *
    * Scale shape: one token explode into two combinable
    * (doc_id, gram) count aggregates (shuffle keyed by doc+gram —
    * combinable map-side, no skew beyond a doc's own vocabulary), one
    * per-doc reduce each, and a per-doc join of the three profiles.
    * Zero-word docs are excluded (no denominator), like [[quality]]'s
    * null-text contract.
    */
  def repetitionStats(docs: DataFrame,
      maxTopWordPpm: Long = 300000L, maxTopBigramPpm: Long = 200000L,
      maxDupBigramPpm: Long = 600000L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = Par.spread(docs)
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        filter(split(col(textCol), " "), w => w =!= "").as("ws"))
      .where(size(col("ws")) > 0)
    val n = base.select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
    val topWord = base
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("mxw"))
    // sequence(1, 0) in Spark is the DESCENDING array [1, 0], so a
    // single-word doc would evaluate element_at(ws, 2) and throw —
    // guard the fan-out to an empty array (explode then emits no
    // rows, the left join coalesces the profile to 0, matching the
    // oracle's empty range(1, len(ws))).
    val bigrams = base
      .select(col("doc_id"), explode(expr(
        "case when size(ws) >= 2 then " +
          "transform(sequence(1, size(ws) - 1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1))) " +
          "else array() end"))
        .as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("mxb"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
    n.join(topWord, Seq("doc_id"))
      .join(bigrams, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        expr("mxw * 1000000L div n_words").as("top_word_ppm"),
        expr("coalesce(mxb, 0L) * 2000000L div n_words").as("top_bigram_ppm"),
        expr("coalesce(dup, 0L) * 2000000L div n_words").as("dup_bigram_ppm"))
      .withColumn("keep",
        col("top_word_ppm") <= maxTopWordPpm &&
          col("top_bigram_ppm") <= maxTopBigramPpm &&
          col("dup_bigram_ppm") <= maxDupBigramPpm)
      .orderBy("doc_id")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines, beyond
  * the dedup/similarity ladder in [[DocDedup]]/[[Similarity]]:
  * benchmark decontamination, repetition-based quality filtering (the
  * Gopher-rule shape), deterministic stratified sampling, TF-IDF term
  * scoring, and token-budget sequence packing.
  *
  * Design rules shared by every op here:
  *   - all scoring is exact integer arithmetic (counts, micro-unit
  *     floors) so each op carries a full DuckDB oracle — no float
  *     drift, no rows-only checks;
  *   - every per-doc stage is map-side combinable (explode → groupBy
  *     with partial aggregation), and every cross-doc stage keys its
  *     shuffle by something bounded (shingle hash, term, shard), never
  *     by "the whole corpus".
  */
object Curation {

  /** `floor(num·10⁶ / den)` as a long — micro-unit export of a ratio
    * of counts. Exact despite the double division: for integer
    * `a = num·10⁶ ≤ 2⁵³` and small integer `den`, `a/den` sits at
    * least `1/den ≫ ulp` away from the next integer, so the floor
    * can't misround. DuckDB's integer `//` matches it bit for bit for
    * the NON-NEGATIVE numerators every caller here has — for negative
    * values `//` truncates toward zero while floor() floors, so a
    * signed oracle must spell out floor() (q66 does).
    */
  private[ops] def ppmFloor(num: Column, den: Column): Column =
    floor((num * 1000000L).cast("double") / den.cast("double")).cast("long")

  /** Benchmark decontamination: flag corpus documents that share at
    * least `minHits` distinct word `n`-gram shingles with ANY document
    * of the evaluation set — the standard "remove test-set overlap
    * before training" sweep. Returns flagged docs with the number of
    * distinct contaminating shingles and the smallest eval doc id hit.
    *
    * Scale shape: the eval side is benchmark-sized by contract
    * (thousands of docs, not the corpus), so its exploded shingle set
    * is broadcast — the 100 TB corpus streams map-side through a
    * broadcast-hash join and the only shuffle is the per-doc count
    * aggregation (map-side combinable). Shingles travel as the
    * codegen'd 8-byte `shingle_hashes` longs, not strings; the oracle
    * joins the textual shingles (identical counts absent 64-bit
    * collisions, the same contract q21/q22 pin).
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, n: Int = 3,
      minHits: Long = 1L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def sh(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      explode(call_function("shingle_hashes", split(col(textCol), " "), lit(n))).as("s"))
    val evS = sh(evalSet, "eval_id")
    val coS = sh(Par.spread(corpus), "doc_id")
    coS.join(broadcast(evS), Seq("s"))
      .groupBy("doc_id")
      .agg(countDistinct(col("s")).as("hit_shingles"), min(col("eval_id")).as("eval_hit"))
      .where(col("hit_shingles") >= minHits)
      .orderBy("doc_id")
  }

  /** Repetition quality metrics per document (the Gopher repetition
    * rules, word-n-gram form — this corpus has no line structure):
    *   - `top2_ppm`: fraction (micro-units) of the document's
    *     characters covered by its most frequent word 2-gram
    *     (count × gram length / doc chars); ties break to the
    *     lexicographically smallest gram;
    *   - `dup5_ppm`: fraction (micro-units) of word 5-gram POSITIONS
    *     whose gram occurs more than once in the doc;
    *   - `keep`: both fractions under their thresholds.
    * Documents too short for a gram size score 0 for that metric
    * (nothing repeats). Map-only per doc up to the (doc, gram)
    * count — the groupBy is map-side combinable and keyed by
    * (doc, gram), so corpus growth adds tasks, not skew.
    */
  def repetition(docs: DataFrame, topFracPpm: Long = 200000L,
      dupFracPpm: Long = 300000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // grams as a guarded transform: sequence(1, n-1) would DESCEND for
    // a 1-word doc (Spark sequences run backwards when from > to) and
    // fabricate grams — gate on word count first
    def grams(ws: Column, n: Int): Column =
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    // three consumers (2-gram branch, 5-gram branch, final join) —
    // materialize once instead of re-splitting the text three times
    val base = Par.spread(docs).select(col(idCol).as("doc_id"),
        length(col(textCol)).as("n_chars"), split(col(textCol), " ").as("ws"))
      .localCheckpoint()
    val c2 = base.select(col("doc_id"), explode(grams(col("ws"), 2)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("g"))
    val top2 = c2.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("g").as("top_gram"),
        (col("cnt") * length(col("g"))).as("top_chars"))
    val d5 = base.select(col("doc_id"), explode(grams(col("ws"), 5)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_pos"),
        sum(col("cnt")).as("tot_pos"))
    base.select("doc_id", "n_chars")
      .join(top2, Seq("doc_id"), "left")
      .join(d5, Seq("doc_id"), "left")
      .select(col("doc_id"), col("top_gram"),
        coalesce(ppmFloor(col("top_chars"), col("n_chars")), lit(0L)).as("top2_ppm"),
        coalesce(ppmFloor(col("dup_pos"), col("tot_pos")), lit(0L)).as("dup5_ppm"))
      .withColumn("keep", col("top2_ppm") < topFracPpm && col("dup5_ppm") < dupFracPpm)
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: keep a document iff
    * `mix31(doc_id) mod 1000 < rate‰(label)` — the hash-threshold
    * sample every curation pipeline needs when "10% of src1, 2% of
    * the rest" must be reproducible across runs, retries, and engines
    * (no RNG state, no seed plumbing; the decision is a pure function
    * of the row). The sampling itself is map-only — the filter pushes
    * to the scan; the trailing orderBy is presentation for the oracle
    * gate (drop it in a pipeline and nothing shuffles). Returns the
    * kept rows with the hash residue that admitted them.
    */
  def stratifiedSample(docs: DataFrame, ratesPpk: Map[String, Int],
      defaultPpk: Int, labelCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    // deterministic CASE ladder: sorted keys so the plan (and the
    // oracle restatement) never depends on map iteration order
    val rate = ratesPpk.toSeq.sortBy(_._1).foldRight(lit(defaultPpk)) {
      case ((k, v), acc) => when(col("label") === k, lit(v)).otherwise(acc)
    }
    docs.select(col(idCol).as("doc_id"), col(labelCol).as("label"),
        pmod(Similarity.mix31Col(col(idCol)), lit(1000L)).as("h_ppk"))
      .where(col("h_ppk") < rate)
      .orderBy("doc_id")
  }

  /** Domain-mixture planner: given target mixture weights (ppm per
    * source), compute the largest total token budget the corpus can
    * serve while preserving the mixture — `T = min_s(avail_s·10⁶ //
    * w_s)` (the binding source caps everyone) — then each source's
    * token quota, the deterministic hash-sampling rate (ppk) that
    * realizes it, and what that rate actually samples. The one-page
    * plan a data-mixing job (fixed-mixture or DoReMi-style reweighting
    * output) executes before training.
    *
    * All arithmetic is integer floor division, exact in any engine.
    * Long intermediates hold to ~9·10¹² available tokens per source
    * (avail·10⁶ must fit int64) — beyond that, widen to decimal;
    * kept long here so the oracle's BIGINT path is bit-identical.
    *
    * Shape: one map-side-combinable groupBy keyed by source (bounded
    * key space), one single-row global min broadcast back, one
    * map-only sample filter — nothing shuffles more than the per-
    * source stats.
    */
  def mixturePlan(docs: DataFrame, weightsPpm: Map[String, Long],
      labelCol: String = "source", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = typedLit(weightsPpm)
    val t = docs
      .where(col(labelCol).isNotNull && col(textCol).isNotNull &&
        element_at(w, col(labelCol)).isNotNull)
      .select(col(idCol).as("doc_id"), col(labelCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("toks"),
        element_at(w, col(labelCol)).as("w_ppm"),
        pmod(Similarity.mix31Col(col(idCol)), lit(1000L)).as("h_ppk"))
    val avail = t.groupBy("source", "w_ppm")
      .agg(sum("toks").as("avail_tokens"))
    // the binding source: smallest avail/weight ratio caps the total
    val budget = avail
      .agg(min(expr("(avail_tokens * 1000000) div w_ppm")).as("budget_tokens"))
    val plan = avail.crossJoin(broadcast(budget))
      .withColumn("quota_tokens", expr("(budget_tokens * w_ppm) div 1000000"))
      .withColumn("rate_ppk", expr("(quota_tokens * 1000) div avail_tokens"))
    val sampled = t.join(
        plan.select(col("source"), col("rate_ppk")), Seq("source"))
      .where(col("h_ppk") < col("rate_ppk"))
      .groupBy("source")
      .agg(count(lit(1)).as("sampled_docs"), sum("toks").as("sampled_tokens"))
    plan.join(sampled, Seq("source"), "left")
      .select(col("source"), col("w_ppm"), col("avail_tokens"),
        col("quota_tokens"), col("rate_ppk"),
        coalesce(col("sampled_docs"), lit(0L)).as("sampled_docs"),
        coalesce(col("sampled_tokens"), lit(0L)).as("sampled_tokens"))
      .orderBy("source")
  }

  /** Temperature-scaled mixing allocation — the multilingual
    * pretraining rule p_i ∝ n_i^(1/T), with the exponent expressed in
    * QUARTERS (q/4) so every weight is integer-exact: q=4 is
    * proportional sampling (T=1), q=2 the common √-temperature (T=2),
    * q=3 ≙ n^0.75, q=1 ≙ n^0.25 (strong tail-language upsampling).
    * floor(n^(q/4)) comes from nested exact integer square roots
    * ([[Similarity.isqrtCol]]), and the token budget splits across
    * labels by largest-remainder (Hamilton) apportionment — so
    * Σalloc == budget EXACTLY and the oracle replays every
    * allocation, including the +1 remainders.
    *
    * Scale shape: one combinable aggregate folds the corpus to the
    * label grid (|labels| rows); the total and the remainder ranking
    * run on that grid ([[Par.globalRowNumber]] — no single-partition
    * window even if the label set ever grows).
    */
  def temperatureMix(docs: DataFrame, quarters: Int = 2,
      budgetTokens: Long = 1000000L, labelCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(quarters >= 1 && quarters <= 4,
      s"quarters must be in [1, 4], got $quarters")
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    import graft.ops.Similarity.isqrtCol
    val n = docs
      .where(col(labelCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(labelCol).as("label"))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    def pow(x: Column): Column = quarters match {
      case 4 => x
      case 2 => isqrtCol(x)
      case 1 => isqrtCol(isqrtCol(x))
      case 3 => isqrtCol(isqrtCol(x * x * x))
    }
    val w = n.withColumn("weight", pow(col("n_tokens")))
      .where(col("weight") > 0)
    val tot = w.agg(sum("weight").as("W"))
    val base = w.crossJoin(broadcast(tot))
      .withColumn("a", expr(s"(${budgetTokens}L * weight) div W"))
      .withColumn("r", expr(s"(${budgetTokens}L * weight) % W"))
    val leftover = base.agg((lit(budgetTokens) - sum("a")).as("L"))
    Par.globalRowNumber(base.withColumn("negr", -col("r")),
        Seq("negr", "label"))
      .crossJoin(broadcast(leftover))
      .select(col("label"), col("n_tokens"), col("weight"),
        (col("a") + when(col("rownum") <= col("L"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("label")
  }

  /** Deterministic weighted priority sample (weighted bottom-k): each
    * row draws rank `mix31(id) // weight` — heavier rows divide their
    * hash by more, landing proportionally lower — and the k smallest
    * ranks win (ties to the lower id). The PPSWOR-shaped sample a
    * mixing job wants when "prefer longer documents, but
    * reproducibly": no RNG, the winner set is a pure function of ids
    * and weights, identical on every engine and retry.
    *
    * Scale shape: rank is map-only; the global k-smallest cut is
    * TakeOrdered (per-partition top-k then a k-row driver merge) —
    * never a global sort.
    */
  def weightedPrioritySample(docs: DataFrame, k: Int = 50,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("weight"),
        Similarity.mix31Col(col(idCol)).as("h"))
      .where(col("weight") > 0)
      .withColumn("rank_key", expr("h div weight"))
      .orderBy("rank_key", "doc_id")
      .limit(k)
  }

  /** Per-label percentile gate: keep each label's top share of rows by
    * a score, decided by exact integer rank arithmetic —
    * `(rank-1)·1000 // n < keepTopPpk` with rank ordered (score desc,
    * id) — so "top 30% per domain" admits the same rows in every
    * engine, no float percentiles anywhere. The score is pluggable;
    * any integer quality signal ([[lexicalDiversity]]'s ttr,
    * [[TextAnalysis.qualityScore]], a model score in micro-units)
    * slots in. ONE shuffle on the label key for both windows.
    */
  def percentileGate(scored: DataFrame, scoreCol: String,
      labelCol: String = "source", idCol: String = "doc_id",
      keepTopPpk: Int = 300): DataFrame = {
    val w = Window.partitionBy(labelCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    val wAll = Window.partitionBy(labelCol)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .where(expr(s"((rank - 1) * 1000) div n") < keepTopPpk)
      .select(col(labelCol), col(idCol), col(scoreCol), col("rank"), col("n"))
      .orderBy(labelCol, idCol)
  }

  /** TF-IDF-style top-`k` terms per document with a rational score:
    * `score_ppm = floor(tf·10⁶ / df)` (term frequency over document
    * frequency — same ordering intent as tf·idf, but exact integer
    * arithmetic instead of a transcendental log, so the oracle
    * verifies scores bit-for-bit). Rank ties break to the
    * lexicographically smallest term.
    *
    * Scale shape: tf is one map-side-combinable groupBy keyed by
    * (doc, term); df folds tf by term (the term dictionary is orders
    * of magnitude smaller than the corpus — AQE broadcasts it back);
    * the top-k window shuffles by doc_id once. tf feeds two branches
    * (df and the join), so it's materialized, not recomputed.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = Par.spread(docs)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_ppm").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score_ppm", ppmFloor(col("tf"), col("df")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score_ppm")
      .orderBy("doc_id", "rank")
  }

  /** Email-address regex, kept to the Java/RE2 common subset so the
    * plan (Java `regexp_replace`) and the DuckDB oracle (RE2) match
    * byte for byte: plain character classes and `{2,}`, no lookaround,
    * no backreferences.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad shape (word-bounded). Deliberately shape-only — the
    * 0-255 octet range check is [[graft.functions.Functions.isIPv4]]'s
    * job; a scrubber must also catch invalid-but-intended addresses.
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrub: count and redact email addresses and IPv4 literals per
    * document. Counts are taken on the ORIGINAL text (so an address
    * swallowed by the email redaction is still counted as an IP hit in
    * both engines); redaction applies emails first, then IPs — the
    * order is part of the contract because an email's host part can
    * look like a dotted quad.
    *
    * Scale shape: the scrub is map-only — two regex counts and two
    * global replaces per row, projection pushes to the scan; the
    * trailing orderBy is presentation for the oracle gate (drop it in
    * a pipeline and nothing shuffles). Regexes compile once per task
    * inside codegen'd `RegExpReplace`/`RegExpCount`; no UDF.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ips"),
        regexp_replace(regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>").as("clean"))
      .orderBy("doc_id")

  /** Lexical-diversity quality metrics per document, the counting
    * complement of the repetition rules above:
    *   - `ttr_ppm`: type/token ratio (distinct words over words);
    *   - `hapax_ppm`: fraction of DISTINCT words occurring exactly
    *     once (hapax legomena over vocabulary size);
    *   - `mwl_ppm`: mean word length in micro-chars.
    * All micro-unit floors of integer count ratios — bit-exact in any
    * engine. Shape: one explode → (doc, word) groupBy (map-side
    * combinable: a word repeated k times in one partition arrives at
    * the shuffle as one row) → per-doc fold. No joins, one shuffle
    * keyed by (doc, word), a second tiny one keyed by doc.
    */
  def lexicalDiversity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Par.spread(docs)
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(length(col("w")) * col("cnt")).as("n_chars"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        ppmFloor(col("n_types"), col("n_tokens")).as("ttr_ppm"),
        ppmFloor(col("n_hapax"), col("n_types")).as("hapax_ppm"),
        ppmFloor(col("n_chars"), col("n_tokens")).as("mwl_ppm"))
      .orderBy("doc_id")

  /** Deterministic train/val/test assignment: `mix31(doc_id) mod 1000`
    * lands in [0, trainPpk) → train, [trainPpk, trainPpk+valPpk) →
    * val, else test — the split analogue of [[stratifiedSample]]
    * (same portable hash, so the SAME document lands in the SAME split
    * in every engine, on every retry, at every scale; no RNG, no seed
    * file). Returns per-(split, source) document and whitespace-token
    * totals — the table a training job reads to size its shards.
    *
    * Shape: map-only assignment, then ONE map-side-combinable groupBy
    * whose key space is |splits|×|sources| — bounded, tiny, skew-free
    * regardless of corpus size.
    */
  def splitAssign(docs: DataFrame, trainPpk: Int = 800, valPpk: Int = 100,
      textCol: String = "text", labelCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val h = pmod(Similarity.mix31Col(col(idCol)), lit(1000L))
    docs.select(
        when(h < trainPpk, "train").when(h < trainPpk + valPpk, "val")
          .otherwise("test").as("split"),
        col(labelCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("toks"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy("split", "source")
  }

  /** Fixed-SIZE per-stratum sample: exactly `k` documents per label
    * (fewer if the stratum is smaller), chosen as the k smallest
    * `mix31(doc_id)` values — a deterministic
    * uniform-without-replacement draw (mix31 is a bijection on 31-bit
    * ids: multiply-by-odd mod 2^31 and both xorshifts are invertible,
    * so there are no hash ties and the sample is a pure function of
    * the ids). The rate-based [[stratifiedSample]] answers "keep
    * 10% of src1"; this answers "exactly 5 exemplars per source".
    *
    * Scale shape: the bounded-heap `topk_rows` aggregate — partial
    * aggregation caps the shuffle at k rows per label per task, so
    * a billion-doc stratum ships k×tasks rows, never the stratum.
    * (The row_number window form the oracle uses would shuffle and
    * sort every row of every stratum.)
    */
  def stratifiedFixedK(docs: DataFrame, k: Int = 5,
      labelCol: String = "source", idCol: String = "doc_id"): DataFrame =
    docs.select(col(labelCol).as("label"), col(idCol).as("doc_id"),
        Similarity.mix31Col(col(idCol)).as("h"))
      .groupBy("label")
      .agg(call_function("topk_rows",
        struct(col("h"), col("doc_id")), lit(k)).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("label"), (col("i") + 1).cast("int").as("rn"),
        col("r.doc_id").as("doc_id"), col("r.h").as("h"))
      .orderBy("label", "rn")

  /** Proportional stratified sample with an EXACT total budget via
    * the largest-remainder (Hamilton) allocation: each stratum gets
    * `floor(n·budget/N)` slots, the `budget − Σfloor` leftover goes
    * to the largest fractional remainders (ties to the
    * lexicographically first label), and slot winners inside a
    * stratum are the smallest `mix31(id)` — all deterministic, all
    * integer, so the realized sample size is exactly `budget` (for
    * `budget ≤ N`) AND every engine picks the same rows. The eval-set
    * builder's op: downsample a skewed corpus without disturbing the
    * mixture.
    *
    * Scale shape: stratum counts are one combinable aggregate; the
    * allocation window runs over |labels| rows; selection reuses the
    * bounded-heap `topk_rows` aggregate (heap ≤ budget per label,
    * partial-agg capped shuffle) with the per-label cut applied from
    * the broadcast allocation — never a per-stratum global sort.
    */
  def proportionalSample(docs: DataFrame, budget: Long = 100L,
      labelCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(labelCol).as("label"), col(idCol).as("doc_id"),
      Similarity.mix31Col(col(idCol)).as("h"))
    val counts = t.groupBy("label").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("nn"))
    val wr = Window.orderBy(col("rem").desc, col("label"))
    val wall = Window.partitionBy()
    val alloc = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(n * ${budget}L) div nn"))
      .withColumn("rem", expr(s"(n * ${budget}L) % nn"))
      .withColumn("rk", row_number().over(wr))
      .withColumn("sb", sum(col("base")).over(wall))
      .withColumn("k",
        col("base") + when(col("rk") <= lit(budget) - col("sb"), 1L)
          .otherwise(0L))
      .select("label", "n", "k")
    t.groupBy("label")
      .agg(call_function("topk_rows",
        struct(col("h"), col("doc_id")), lit(budget.toInt)).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("label"), (col("i") + 1).cast("long").as("rn"),
        col("r.doc_id").as("doc_id"), col("r.h").as("h"))
      .join(broadcast(alloc), "label")
      .where(col("rn") <= col("k"))
      .select(col("label"), col("rn").cast("int").as("rn"),
        col("doc_id"), col("h"), col("n"), col("k"))
      .orderBy("label", "rn")
  }

  /** Greedy max-coverage corpus selection (the facility-location
    * greedy with the classic (1−1/e) guarantee): pick `k` documents
    * one at a time, each maximizing the count of word 3-gram
    * shingles NOT yet covered by earlier picks (ties to the lowest
    * doc_id) — the "which k docs best span the corpus vocabulary"
    * subset-selection primitive behind diverse-sample curation.
    * Fully deterministic → every round is oracle-exact (the DuckDB
    * restatement unrolls the rounds as CTEs, q117-BPE style).
    *
    * Shape: k fixed rounds; each is one anti-join against the
    * covered-shingle set (equi-key on the shingle), a combinable
    * per-doc gain count, and a TakeOrdered(1) pick that feeds the
    * next round via broadcast — no driver collect, no growing
    * lineage (covered set re-materializes per round).
    */
  def greedyCoverage(docs: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.where(col(textCol).isNotNull)
      .withColumn("ws", split(col(textCol), " "))
      .where(size(col("ws")) >= 3)
      .select(col(idCol).as("doc_id"),
        explode(expr("transform(sequence(1, size(ws) - 2), " +
          "i -> concat_ws(' ', slice(ws, i, 3)))")).as("s"))
      .distinct().localCheckpoint() // probed every round
    var covered = sh.select("s").where(lit(false)).localCheckpoint()
    var out: DataFrame = null
    for (r <- 1 to k) {
      val gains = sh.join(covered, Seq("s"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain"))
      val pick = gains.orderBy(col("gain").desc, col("doc_id")).limit(1)
        .select(lit(r).as("round"), col("doc_id"), col("gain"))
        .localCheckpoint()
      covered = covered
        .union(sh.join(broadcast(pick.select("doc_id")), Seq("doc_id"))
          .select("s"))
        .distinct().localCheckpoint()
      out = if (out == null) pick else out.unionByName(pick)
    }
    out.orderBy("round")
  }

  /** Corpus vocabulary head: the `k` most frequent terms with rank
    * and CUMULATIVE corpus-coverage ppm — the table a tokenizer
    * trainer reads first ("how many terms cover 95% of tokens").
    * Rank ties break lexicographically; cumulative coverage floors to
    * micro-units AFTER the exact integer running sum, so every row is
    * bit-exact.
    *
    * Scale shape: one map-side-combinable (term) count, then the
    * top-k cut. The ORDER BY + LIMIT k is the safe global form: Spark
    * runs it as per-partition TakeOrdered(k) → single-k merge — no
    * global sort of the dictionary, no single-task window. Only the k
    * survivors (k ≪ dictionary) see the final window for rank +
    * running sum.
    */
  def vocabTopK(docs: DataFrame, k: Int = 100, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val counts = Par.spread(docs)
      .select(explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .localCheckpoint() // two consumers: total + top-k
    // sum over zero rows is NULL — treat as 1 so an empty corpus
    // returns zero rows instead of NPE-ing at plan-build (top is empty
    // either way, the denominator never divides a real row)
    val totalRow = counts.agg(sum(col("freq"))).collect()(0)
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    val top = counts.orderBy(col("freq").desc, col("term")).limit(k)
    // k rows from here on — the unpartitioned window is k-bounded
    val w = Window.orderBy(col("freq").desc, col("term"))
    top.withColumn("rank", row_number().over(w))
      .withColumn("cum_freq", sum(col("freq"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("term"), col("freq"),
        ppmFloor(col("cum_freq"), lit(total)).as("cum_ppm"))
      .orderBy("rank")
  }

  /** Fixed-width token chunking (the pretraining chunker): split each
    * document into consecutive `width`-token chunks (the tail keeps
    * its remainder), emitting `(doc_id, chunk_idx, n_tokens, chunk)`.
    * Pairs with [[packSequences]]: chunk first to bound sequence
    * length, then pack chunks into budgeted bins.
    *
    * Map-only — the fan-out is an in-plan transform+explode (no
    * shuffle, no state); chunk text is rebuilt with single spaces, the
    * same normalization the whitespace tokenizer applied.
    */
  def chunkTokens(docs: DataFrame, width: Int = 32, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ws = split(col(textCol), " ")
    val nChunks = ceil(size(ws).cast("double") / width).cast("int")
    docs.select(col(idCol).as("doc_id"), ws.as("ws"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => slice(col("ws"), i * width + 1, lit(width)))).as(Seq("chunk_idx", "cw")))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("cw")).cast("long").as("n_tokens"),
        concat_ws(" ", col("cw")).as("chunk"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Token-budget sequence packing (training-batch assembly):
    * documents are packed into bins of `budgetTokens` whitespace
    * tokens by sequential fill — within each shard, docs in doc_id
    * order land in bin `floor(tokens-before-this-doc / budget)`. A doc
    * may straddle its bin boundary (the packer that truncates or
    * splits sits downstream); what this op fixes is the deterministic
    * doc → bin assignment.
    *
    * Scale shape: the running sum is windowed PER SHARD, never
    * globally — a global ordering would serialize 100 TB through one
    * task, while shards (source, date, path prefix...) bound each
    * window partition and pack in parallel. Bin ids are (shard, bin).
    */
  def packSequences(docs: DataFrame, budgetTokens: Long = 512L,
      shardCol: String = "source", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).as("doc_id"), col(shardCol).as("shard"),
        size(split(col(textCol), " ")).cast("long").as("tokens"))
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      // exact: cum_before ≤ 2^53 and budget is a small integer, so the
      // double division floors identically to DuckDB's integer //
      .withColumn("bin", floor(col("cum_before").cast("double") / budgetTokens).cast("long"))
      .select("doc_id", "shard", "tokens", "bin")
      .orderBy("doc_id")
  }

  /** Freshness-driven recrawl scheduling (the Cho–Garcia-Molina
    * change-rate shape, linearized to stay integer-exact): from a
    * fetch history `(url key, fetch ts, content hash)` estimate each
    * URL's change rate — consecutive-fetch hash flips over the
    * observed span — and rank by expected staleness
    * `rate · age`, where age is the time since the URL's last fetch
    * (measured against the history's own max ts, so the op is a pure
    * function of its input). All integer micro-units: rate is
    * ppm-changes-per-hour (`n_changes·10⁶·3600 // span_sec`),
    * priority is `rate · age_sec // 3600` in exact 64-bit arithmetic
    * (never through a double — the product exceeds 2⁵³). Returns the
    * top `topN` stalest URLs.
    *
    * Scale shape: the per-URL history window is bounded by a URL's
    * own fetch count (a crawler re-fetches a page dozens of times,
    * not millions); per-URL stats are one combinable aggregate; "now"
    * is a 1-row broadcast; the final cut is TakeOrderedAndProject,
    * never a global sort.
    */
  def recrawlPriority(fetches: DataFrame, topN: Int = 100,
      urlCol: String = "url_key", tsCol: String = "ts",
      contentCol: String = "content_hash"): DataFrame = {
    require(topN >= 1, s"topN must be positive, got $topN")
    // ties on ts order by content too: rows with an equal sort key
    // carry an equal hash, so the flip sequence is permutation-proof
    val w = Window.partitionBy("u").orderBy("ts", "h")
    val t = fetches
      .where(col(urlCol).isNotNull && col(tsCol).isNotNull &&
        col(contentCol).isNotNull)
      .select(col(urlCol).as("u"), col(tsCol).as("ts"),
        col(contentCol).as("h"))
      .withColumn("prev", lag(col("h"), 1).over(w))
      .withColumn("chg",
        (col("prev").isNotNull && col("prev") =!= col("h")).cast("long"))
    val g = t.groupBy("u").agg(
      count(lit(1)).as("n_fetches"),
      sum(col("chg")).as("n_changes"),
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        .as("span_sec"),
      unix_timestamp(max(col("ts"))).as("last_sec"))
    recrawlRank(g, topN)
  }

  /** The staleness-ranking tail of [[recrawlPriority]], shared with
    * the streaming stats twin: takes per-URL
    * `(u, n_fetches, n_changes, span_sec, last_sec)` and ranks by the
    * exact-integer `rate · age` product against the table's own max
    * last-fetch time.
    */
  private[graft] def recrawlRank(g: DataFrame, topN: Int): DataFrame = {
    val now = g.agg(max(col("last_sec")).as("now_sec"))
    g.crossJoin(broadcast(now))
      .withColumn("age_sec", col("now_sec") - col("last_sec"))
      .withColumn("rate_ppm_hr", when(col("span_sec") > 0,
        expr("n_changes * 1000000L * 3600L div span_sec"))
        .otherwise(lit(0L)))
      .withColumn("priority", expr("rate_ppm_hr * age_sec div 3600"))
      .select(col("u").as("url_key"), col("n_fetches"),
        col("n_changes"), col("span_sec"), col("age_sec"),
        col("rate_ppm_hr"), col("priority"))
      .orderBy(col("priority").desc, col("url_key"))
      .limit(topN)
  }

  /** Length-bucketed batching plan (the inference/training dynamic-
    * batching prep): cut documents into `buckets` equal-FREQUENCY
    * token-length buckets (boundary_j = the smallest length whose
    * cumulative doc count reaches j·N/B — percentile_disc, exact
    * integer comparison `cum·B ≥ j·N`), assign each doc to the first
    * bucket whose boundary covers its length, and report per bucket
    * the padding waste of padding every member to the bucket boundary
    * — plus the single-bucket baseline waste (`N·max − Σlen`) each row
    * carries for the savings comparison. All counts and boundaries are
    * exact integers; assignment depends on the length alone, so the
    * plan is engine-reproducible.
    *
    * Scale shape: per-length counts are one combinable aggregate; the
    * only windowed table is the DISTINCT-length table (bounded by the
    * max document length, thousands of rows at corpus scale — never
    * the corpus); boundaries broadcast back and assignment + waste
    * are a map-only pass with one final B-row aggregate. The corpus
    * is never globally sorted (an `ntile` over N rows would be).
    */
  def lengthBucketPlan(docs: DataFrame, buckets: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val lens = docs
      .where(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(size(split(col(textCol), " ")).cast("long").as("len"))
    val perLen = lens.groupBy("len").agg(count(lit(1)).as("c"))
    val wLen = Window.orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLen.withColumn("cum", sum(col("c")).over(wLen))
    val tot = perLen.agg(sum(col("c")).as("n"),
      sum(col("c") * col("len")).as("sum_len"), max(col("len")).as("mx"))
    // boundary_j = min len with cum·B ≥ j·N (exact integers)
    val bounds = cum.crossJoin(broadcast(tot))
      .select(explode(sequence(lit(1), lit(buckets))).as("bucket"),
        col("len"), col("cum"), col("n"))
      .where(col("cum") * buckets >= col("bucket") * col("n"))
      .groupBy("bucket").agg(min(col("len")).as("boundary"))
    // assignment runs over the DISTINCT-length table only (the ≤-join
    // is a bounded B-row nested loop over distinct lengths, never the
    // corpus); a length covering several quantile cuts takes the
    // FIRST covering bucket, so heavy lengths can leave later buckets
    // empty — a ragged plan, replayed identically by the oracle
    val assign = perLen
      .join(broadcast(bounds), col("len") <= col("boundary"))
      .groupBy("len", "c")
      .agg(min(struct(col("boundary"), col("bucket"))).as("fb"))
      .select(col("len"), col("c"), col("fb")("bucket").as("bucket"),
        col("fb")("boundary").as("boundary"))
    assign.groupBy("bucket", "boundary")
      .agg(sum(col("c")).as("n_docs"),
        sum(col("c") * col("len")).as("sum_tokens"),
        sum(col("c") * (col("boundary") - col("len")))
          .as("padding_waste"))
      .crossJoin(broadcast(tot))
      .select(col("bucket").cast("int").as("bucket"), col("boundary"),
        col("n_docs"), col("sum_tokens"), col("padding_waste"),
        (col("n") * col("mx") - col("sum_len")).as("baseline_waste"))
      .orderBy("bucket")
  }

  /** Byte-pair-encoding merge training, fixed `rounds`: each round
    * counts adjacent token pairs across the corpus, takes the global
    * argmax (ties broken by pair text — deterministic), and rewrites
    * every occurrence into the merged token. Returns the merge table
    * `(round, left, right, cnt)` — the actual artifact a tokenizer
    * trainer ships. Counting is over ALL adjacent positions; the
    * rewrite is leftmost non-overlapping (both are the conventional
    * BPE choices, and both engines implement `replace` with the same
    * continue-after-replacement scan, which the oracle pins).
    *
    * Corpus representation: each doc is a space-joined token string
    * with sentinel spaces at both ends, so a pair occurrence is
    * EXACTLY the substring `" l r "` and the merge is one literal
    * `replace(s, " l r ", " l_r ")` — map-only over docs. Tokens are
    * normalized to `[a-z]` words, so the `_` glue can never collide
    * with input text.
    *
    * Scale shape per round: pair counting is explode → map-side-
    * combinable groupBy (shuffle rows = distinct pairs); the argmax is
    * a 1-row TakeOrdered to the driver; the rewrite is map-only. Each
    * round materializes (localCheckpoint) so round r never replays
    * rounds 1..r−1's rewrites.
    */
  def bpeMerges(docs: DataFrame, rounds: Int = 5,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z ]", ""), " +", " "))
    var s = docs.select(norm.as("n"))
      .where(col("n") =!= "")
      .select(concat(lit(" "), col("n"), lit(" ")).as("s"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = s.select(split(trim(col("s")), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getAs[String]("pair")
        val cnt = top.head.getAs[Long]("cnt")
        val Array(l, rr) = pair.split(" ", 2)
        merges += ((r, l, rr, cnt))
        s = s.select(expr(s"replace(s, ' $l $rr ', ' ${l}_$rr ') AS s"))
          .localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    // lhs/rhs, not left/right — the merge table must survive an
    // unquoted ANSI SQL restatement (oracle parity)
    merges.toSeq.toDF("round", "lhs", "rhs", "cnt")
      .orderBy("round")
  }

  /** Apply a trained [[bpeMerges]] table to the corpus — the ENCODE
    * side of the tokenizer: the same normalization, then the merges
    * as ordered literal rewrites (training order matters: later
    * merges reference earlier merged tokens). Map-only — the whole
    * merge chain is one projection of nested `replace` calls, no
    * shuffle, no state; per-doc output is the raw and encoded token
    * counts plus the floor-ppm compression the merges bought.
    */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z ]", ""), " +", " "))
    val base = docs.select(col(idCol).as("doc_id"), norm.as("n"))
      .where(col("n") =!= "")
      .select(col("doc_id"),
        size(split(col("n"), " ")).cast("long").as("n_raw"),
        concat(lit(" "), col("n"), lit(" ")).as("s"))
    val encoded = merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("s", expr(s"replace(s, ' $l $r ', ' ${l}_$r ')"))
    }
    encoded.select(col("doc_id"), col("n_raw"),
        size(split(trim(col("s")), " ")).cast("long").as("n_tokens"))
      .withColumn("saved_ppm",
        expr("((n_raw - n_tokens) * 1000000) div n_raw"))
      .orderBy("doc_id")
  }

  /** CCNet-shaped boilerplate removal: chop each document into
    * consecutive `segWords`-word segments, count each segment's
    * corpus-wide document frequency, drop segments shared by more than
    * `maxDf` documents (nav bars, license headers, cookie banners in
    * real crawls), and reassemble the surviving segments in order.
    * Mirrors the per-paragraph hash dedup of CCNet (Wenzek et al.
    * 2020) with word windows standing in for paragraphs (this corpus
    * has no line structure).
    *
    * Scale shape: segments explode map-side; document frequency is one
    * map-side-combinable aggregation keyed by segment; the drop is a
    * left_anti against only the OVER-threshold segments — by Zipf that
    * set is tiny relative to the corpus (boilerplate is, by
    * definition, few distinct strings repeated massively), so AQE
    * turns it into a broadcast anti-join; reassembly is one per-doc
    * aggregation. At 100 TB the segment key travels as xxhash64, not
    * the string (the oracle joins text; same result absent 64-bit
    * collisions — the q21/q22 contract).
    */
  def boilerplateRemove(docs: DataFrame, segWords: Int = 8, maxDf: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    // split("", " ") = [""] so nseg >= 1 always — sequence() never sees
    // a negative upper bound
    val nseg = (size(toks) + segWords - 1).divide(segWords).cast("int")
    val base = Par.spread(docs.select(col(idCol).cast("long").as("doc_id"),
      toks.as("t"), nseg.as("nseg")))
    val segs = base.select(col("doc_id"), col("nseg"),
      posexplode(transform(sequence(lit(0), col("nseg") - 1),
        i => array_join(slice(col("t"), i * segWords + 1, lit(segWords)), " "))))
      .withColumnRenamed("pos", "si").withColumnRenamed("col", "seg")
    val frequent = segs.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") > maxDf)
      .select("seg")
    val kept = segs.join(frequent, Seq("seg"), "left_anti")
    val reassembled = kept.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("si"),
        col("seg")))), s => s.getField("seg")), " ").as("clean_text"),
      count(lit(1)).as("kept_segments"))
    base.select(col("doc_id"), col("nseg"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_segments"), lit(0L)).as("kept_segments"),
        (col("nseg").cast("long") - coalesce(col("kept_segments"), lit(0L)))
          .as("dropped_segments"))
      .orderBy("doc_id")
  }

  /** Duplicated-span statistics, the diagnostic behind exact-substring
    * training-data dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): for every word `n`-gram
    * POSITION in every document, is that n-gram's text shared with at
    * least one OTHER document? Reports per-doc position counts and the
    * duplicated fraction in exact permille — the score a curation
    * pipeline thresholds to route docs to span-trimming.
    *
    * Scale shape: positions explode map-side (n_words − n + 1 per
    * doc); document frequency per gram is one combinable aggregation;
    * the per-position flag is an equi-join back on the gram key — the
    * same key the frequency shuffle already hashed, so the exchange is
    * reused, not repeated. At 100 TB grams travel hashed (xxhash64),
    * and the df table needs only `df >= 2` rows (a semi-join set).
    */
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    * each language, order documents best-first by corpus LM score
    * ([[TextAnalysis.bigramLmScore]] — the integer stand-in for
    * negative perplexity) and split them into head/middle/tail at the
    * 1/3 and 2/3 marks of cumulative TOKEN mass (not doc count — the
    * buckets are what a mixing plan samples tokens from). Contract:
    * a doc is `head` when its inclusive cumulative mass ≤ total/3,
    * `middle` up to 2/3, else `tail`; ties in score break by doc_id.
    * Docs under 2 tokens carry no LM score and are absent (gate them
    * with the length rules first).
    *
    * Scale shape: the LM score is q90's combinable-aggregate pipeline;
    * the cumulative mass is one window per language partition — the
    * partition count is |languages|, each sortable independently; no
    * global sort, no driver state.
    */
  def ccnetBuckets(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val scored = TextAnalysis.bigramLmScore(docs, textCol, idCol)
      .join(docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        size(split(col(textCol), " ")).cast("long").as("toks")), "doc_id")
    // running mass via the range-shuffle prefix-sum primitive — a
    // 90%-one-language corpus spreads across partitions instead of
    // serializing in a single per-language window (the skew caveat
    // SCALE.md used to carry for this operator); per-language totals
    // are a combinable aggregate broadcast back onto the rows
    val withCum = Par.prefixSum(
      scored.withColumn("neglm", -col("lm_ppm")),
      Seq("lang"), Seq("neglm", "doc_id"), "toks", "cum")
    val totals = scored.groupBy("lang").agg(sum("toks").as("total"))
    withCum.join(broadcast(totals), "lang")
      .select(col("doc_id"), col("lang"), col("lm_ppm"), col("toks"),
        when(col("cum") * 3 <= col("total"), lit("head"))
          .when(col("cum") * 3 <= col("total") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy("doc_id")
  }

  /** Sliding-window document chunker: split each document into
    * word-token windows of `window` tokens advancing by `stride`
    * (stride < window → overlapping context, the RAG/pretraining
    * norm). Chunk starts are the arithmetic progression
    * {0, stride, 2·stride, …} below the doc's token count; the tail
    * chunk is emitted even when short (dropping it would silently
    * lose document suffixes). Emits the chunk text plus its exact
    * token span so downstream spans can be mapped back.
    *
    * Deterministic slicing — the oracle regenerates every chunk.
    *
    * Scale shape: pure map-side explode (one row per chunk, no
    * shuffle, no join); chunk count per doc is ⌈W/stride⌉, so output
    * size is linear in corpus tokens × (window/stride) overlap factor.
    */
  def chunkSliding(docs: DataFrame, window: Int = 64, stride: Int = 48,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    Par.spread(docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .where(size(col("t")) >= 1))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          floor((size(col("t")) - 1) / lit(stride)).cast("int"))).as("ci"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        (col("ci") * stride).cast("long").as("start_tok"),
        least(lit(window), size(col("t")) - col("ci") * stride)
          .cast("long").as("n_toks"),
        array_join(slice(col("t"), col("ci") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** WITHIN-document repetition profile (the Gopher curation rules,
    * Rae et al. 2021 §A1.1): per document and n-gram size, the mass
    * of the single most-frequent word n-gram and the mass of ALL
    * repeated n-grams, in exact permille of the doc's n-gram
    * positions. High top-fraction flags looping/template text; high
    * dup-fraction flags boilerplate-stuffed docs — the two cheapest
    * pre-training quality gates after length. Complements
    * [[dupSpanStats]], which measures CROSS-document repetition.
    *
    * Integer-exact (`count·1000 div positions`), so the oracle
    * reproduces every cell. Docs shorter than min(ns) words have no
    * positions and are absent.
    *
    * Scale shape: n-gram positions explode map-side; the
    * (doc, n, gram) count and the per-(doc, n) roll-up are both
    * combinable aggregations, and nothing leaves the doc's key space —
    * no joins, no skew coupling between documents.
    */
  def intraDocRepetition(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram sizes: $ns")
    val toks = split(col(textCol), " ")
    val base = Par.spread(docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), toks.as("t")))
    val gramArrays = ns.map { n =>
      when(size(col("t")) >= n,
        transform(sequence(lit(0), size(col("t")) - n),
          p => struct(lit(n).as("n"),
            array_join(slice(col("t"), p + 1, lit(n)), " ").as("gram"))))
        .otherwise(array().cast("array<struct<n:int,gram:string>>"))
    }
    val grams = base.select(col("doc_id"),
        explode(flatten(array(gramArrays: _*))).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val m = grams.groupBy("doc_id", "n", "gram")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(
        sum(col("c")).as("pos"), max(col("c")).as("top"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup"))
    m.groupBy("doc_id").agg(
        max(when(col("n") === 2, col("top"))).as("top2"),
        max(when(col("n") === 2, expr("top*1000 div pos"))).as("top2_permille"),
        max(when(col("n") === 2, expr("dup*1000 div pos"))).as("dup2_permille"),
        max(when(col("n") === 3, expr("top*1000 div pos"))).as("top3_permille"),
        max(when(col("n") === 3, expr("dup*1000 div pos"))).as("dup3_permille"))
      .orderBy("doc_id")
  }

  def dupSpanStats(docs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = Par.spread(docs
      .select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .where(size(col("t")) >= n))
    val grams = base.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("t")) - n),
        p => array_join(slice(col("t"), p + 1, lit(n)), " "))).as("gram"))
    val shared = grams.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= 2)
      .select("gram")
    val flagged = grams.join(shared.withColumn("dup", lit(1L)),
      Seq("gram"), "left")
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_positions"),
        sum(coalesce(col("dup"), lit(0L))).as("dup_positions"))
      .withColumn("dup_permille",
        expr("(dup_positions * 1000) div n_positions"))
      .orderBy("doc_id")
  }

  /** DSIR-shaped importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"), integer-exact:
    * featurize every document as its word-bigram occurrences, estimate
    * the target domain's per-feature weight as
    * `floor(count_target(f)·10⁶ / count_all(f))` (the hashed-ngram
    * likelihood ratio with the common denominator absorbed), score
    * each non-target document by the sum of its bigram weights, and
    * keep the top `k` — the docs that look most like the target
    * domain. All-integer so the DuckDB oracle reproduces scores bit
    * for bit.
    *
    * Scale shape: bigrams explode map-side; both frequency tables are
    * one combinable aggregation keyed by the bigram; the weight join
    * is bigram-keyed on the same partitioning; the final score is a
    * per-doc combinable sum, and top-k is a TakeOrdered (no global
    * sort materialization). At 100 TB features travel as xxhash64
    * buckets (DSIR's own hashing trick) rather than strings.
    */
  def dsirTopK(docs: DataFrame, targetSource: String = "src0", k: Int = 100,
      textCol: String = "text", idCol: String = "doc_id",
      domainCol: String = "source"): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = Par.spread(docs.select(col(idCol).cast("long").as("doc_id"),
        col(domainCol).as("dom"), toks.as("t"))
      .where(size(col("t")) >= 2))
    val grams = base.select(col("doc_id"), col("dom"),
      explode(transform(sequence(lit(0), size(col("t")) - 2),
        p => concat_ws(" ", col("t").getItem(p), col("t")(p + 1)))).as("f"))
    val weights = grams.groupBy("f").agg(
        count(lit(1)).as("cnt_all"),
        sum(when(col("dom") === targetSource, 1L).otherwise(0L))
          .as("cnt_target"))
      .select(col("f"),
        expr("(cnt_target * 1000000) div cnt_all").as("w"))
    grams.where(col("dom") =!= targetSource)
      .join(weights, Seq("f"))
      .groupBy("doc_id").agg(sum(col("w")).as("score"),
        min(col("dom")).as("source"))
      .select(col("doc_id"), col("source"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Length-balanced training-shard assignment: rank documents by
    * token count (descending, id tiebreak) WITHOUT a global sort
    * ([[Par.globalRowNumber]]) and deal them round-robin across `w`
    * shards — the distributed stand-in for LPT bin packing (dealing
    * in descending size order bounds any shard's excess by one
    * largest-remaining doc per round, the greedy-multiway-partition
    * guarantee). Returns the per-shard report: doc count, token
    * total, and signed deviation from the ideal share in ppm — the
    * imbalance number a training job reads before accepting the
    * layout. Per-doc assignments are a `shard` column on the ranked
    * frame, derivable by the same two-pass rank at any scale.
    */
  def balancedShards(docs: DataFrame, w: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("toks"))
      .withColumn("neg", -col("toks"))
    val ranked = Par.globalRowNumber(toks, Seq("neg", "id"))
      .withColumn("shard", pmod(col("rownum") - 1, lit(w.toLong)))
    val shards = ranked.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
    val total = shards.agg(sum(col("tokens")).as("grand"))
    shards.crossJoin(broadcast(total))
      .select(col("shard"), col("n_docs"), col("tokens"),
        expr(s"(tokens * ${w}L - grand) * 1000000 div grand")
          .as("dev_ppm"))
      .orderBy("shard")
  }

  /** Seeded negative sampling for contrastive training pairs: for
    * each anchor (a deterministic 1-in-`sampleMod` sample), draw `k`
    * pseudo-random corpus documents by seeded hash over a DENSE id
    * ranking, then drop any draw that is the anchor's exact
    * duplicate (same q30 normalized-md5 fingerprint — a "negative"
    * that's really a copy of the anchor poisons the loss; dropped
    * rows are simply absent, honest count per anchor ≤ k).
    *
    * The dense rank comes from [[Par.globalRowNumber]] (range
    * shuffle + broadcast offsets — never a single-partition sort),
    * so `draw = mix31(anchor·7 + j) mod N` indexes the corpus
    * uniformly whatever the id distribution looks like; the draw →
    * id resolution is an equi-join on the rank. Everything is
    * seeded, so reruns emit identical pairs and the oracle replays
    * every draw.
    */
  def negativeSamples(docs: DataFrame, k: Int = 3, sampleMod: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.ops.Similarity.mix31Col
    val ids = Par.globalRowNumber(docs.select(col(idCol).as("id")),
      Seq("id"))
    val n = docs.count()
    val probes = ids.where(pmod(col("id"), lit(sampleMod)) === 0)
      .select(col("id").as("anchor_id"),
        explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("r",
        mix31Col(col("anchor_id") * 7L + col("j")) % n)
    val neg = probes.join(ids.select(col("id").as("neg_id"),
        (col("rownum") - 1L).as("r")), "r")
    val fp = docs.select(col(idCol).as("fid"),
      md5(lower(regexp_replace(col(textCol), "\\s+", " "))).as("fp"))
    neg
      .join(fp.select(col("fid").as("anchor_id"), col("fp").as("fa")),
        "anchor_id")
      .join(fp.select(col("fid").as("neg_id"), col("fp").as("fb")),
        "neg_id")
      .where(col("fa") =!= col("fb"))
      .select(col("anchor_id"), col("j").cast("long").as("j"),
        col("neg_id"))
      .orderBy("anchor_id", "j")
  }

  /** Context-length sweep — the planning table behind "what max
    * sequence length do we train at": for each candidate length L,
    * the share of tokens a hard truncation at L drops, the share of
    * DOCUMENTS it touches, the concat-packing lower bound on
    * sequence count (⌈kept/L⌉), and the padding waste of the naive
    * one-doc-per-sequence layout. Longer L keeps more tokens but
    * pads more; this table is the tradeoff, exact.
    *
    * Scale shape: token counts are one map; the L sweep is a
    * |lengths|-way in-plan explode of counters (map-side), folded by
    * one combinable aggregate to |lengths| rows — a single pass over
    * the corpus regardless of how many lengths are swept.
    */
  def packingSweep(docs: DataFrame, lengths: Seq[Int] = Seq(64, 128, 256, 512),
      textCol: String = "text"): DataFrame = {
    require(lengths.nonEmpty, "packingSweep needs at least one length")
    docs.where(col(textCol).isNotNull)
      .select(size(split(col(textCol), " ")).cast("long").as("tok"))
      .select(col("tok"), explode(
        array(lengths.map(l => lit(l.toLong)): _*)).as("len"))
      .groupBy("len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("total_tokens"),
        sum(least(col("tok"), col("len"))).as("kept_tokens"),
        sum(greatest(col("tok") - col("len"), lit(0L))).as("dropped_tokens"),
        sum((col("tok") > col("len")).cast("long")).as("truncated_docs"))
      .select(col("len"), col("n_docs"), col("total_tokens"),
        col("kept_tokens"), col("dropped_tokens"), col("truncated_docs"),
        expr("dropped_tokens * 1000000 div total_tokens")
          .as("dropped_ppm"),
        expr("truncated_docs * 1000000 div n_docs").as("truncated_doc_ppm"),
        expr("(kept_tokens + len - 1) div len").as("packed_seqs_lb"),
        expr("(n_docs * len - kept_tokens) * 1000000 div (n_docs * len)")
          .as("naive_pad_ppm"))
      .orderBy("len")
  }

  /** Temperature-scaled mixture weights (α = 1/2): per-source sampling
    * weight ∝ √n_docs — the standard flattening between proportional
    * (α=1, big sources dominate) and uniform (α=0, tiny sources
    * over-sampled) when mixing corpora for training. √ is the one
    * fixed α whose weights stay oracle-exact: `w = ⌊√(n·10⁶)⌋` is an
    * integer every engine computes identically (n·10⁶ ≪ 2^52, and a
    * correctly-rounded double sqrt floors exactly there). Reports the
    * flattened share beside the natural share and the per-source
    * draw quota for `budget` documents.
    *
    * One combinable count to |sources| rows; the share/quota math is
    * report-sized.
    */
  def temperatureMixture(docs: DataFrame, budget: Long = 100L,
      srcCol: String = "source"): DataFrame = {
    val counts = docs.where(col(srcCol).isNotNull)
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_e3",
        floor(sqrt(col("n_docs").cast("double") * 1e6)).cast("long"))
    val totals = counts.agg(sum(col("n_docs")).as("tn"),
      sum(col("weight_e3")).as("tw"))
    counts.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("weight_e3"),
        expr("n_docs * 1000000 div tn").as("natural_ppm"),
        expr("weight_e3 * 1000000 div tw").as("temp_ppm"),
        expr(s"($budget * weight_e3) div tw").as("quota"))
      .orderBy("source")
  }

  /** Leave-one-source-out quality ablation — the cheapest data
    * valuation: the corpus mean quality score with each source
    * REMOVED, against the overall mean, computed exactly from one
    * pass of global sums (no per-source rescan — LOSO means are
    * algebra on (ΣS, N) minus the source's own sums). A positive
    * delta says dropping the source would RAISE corpus quality — the
    * below-average sources a mixture pass should down-weight first.
    * Scores are the q78 integer linear classifier
    * ([[TextAnalysis.qualityScore]]), so everything is micro-exact.
    */
  def losoQualityAblation(docs: DataFrame, srcCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .join(docs.select(col(idCol).as("doc_id"), col(srcCol).as("source")),
        "doc_id")
    val per = scored.where(col("source").isNotNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("score_micro")).as("ssum"))
    val tot = per.agg(sum(col("n_docs")).as("tn"), sum(col("ssum")).as("ts"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("ssum div n_docs").as("mean_micro"),
        expr("ts div tn").as("overall_micro"),
        expr("case when tn > n_docs then (ts - ssum) div (tn - n_docs) end")
          .as("loso_micro"),
        expr("case when tn > n_docs then (ts - ssum) div (tn - n_docs)" +
          " - ts div tn end").as("delta_micro"))
      .orderBy("source")
  }

  // encoding-hygiene character classes, shared by the audit columns
  // and the cleanup rewrite so they can never disagree. � is the
  // decoder's replacement char; controls exclude \t \n \r (legitimate
  // whitespace — the collapse step owns those).
  private val BadCharRe = "[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]"
  // UTF-8 bytes decoded as Latin-1: lead byte Ã/Â (U+00C3/U+00C2)
  // followed by a continuation char in U+0080-U+00BF
  private val MojibakeRe = "[\\u00C2\\u00C3][\\u0080-\\u00BF]"

  /** Encoding-hygiene audit + canonical cleanup — the ingest gate a
    * web-scraped corpus runs before any tokenizer sees the text:
    * counts decoder replacement chars (U+FFFD), stray control chars
    * (C0 minus tab/newline/CR), and mojibake lead pairs (UTF-8 read
    * as Latin-1: `Ã`/`Â` + continuation), then emits the cleaned
    * length after stripping the bad classes and collapsing whitespace
    * runs. Mojibake is FLAGGED, never auto-repaired — re-decoding is
    * lossy guesswork that belongs in a quarantine queue, not a bulk
    * rewrite. The audit classes and the strip rewrite share one regex
    * constant, so the `is_clean` flag can never drift from the
    * cleanup it promises.
    *
    * Shape: map-only (regex counts + one rewrite per row) — embarrassingly
    * parallel at 100 TB, no shuffle, no state.
    */
  def textClean(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol)).as("n_chars_raw"),
        regexp_count(col(textCol), lit("\uFFFD")).cast("long")
          .as("n_replacement"),
        regexp_count(col(textCol), lit("[\\x01-\\x08\\x0B\\x0C\\x0E-\\x1F]"))
          .cast("long").as("n_control"),
        regexp_count(col(textCol), lit(MojibakeRe)).cast("long")
          .as("n_mojibake"),
        length(trim(regexp_replace(
          regexp_replace(col(textCol), BadCharRe, ""), "\\s+", " ")))
          .as("n_chars_clean"))
      .withColumn("is_clean",
        col("n_replacement") === 0 && col("n_control") === 0 &&
          col("n_mojibake") === 0)
      .orderBy("doc_id")

  /** One IPF (raking) sweep toward uniform (source × lang) margins:
    * the distribution-matching step a training-mixture rebalance runs
    * when the corpus must hit target marginals that no per-cell
    * weight satisfies directly. Row factors first (`a_i = T_row·10⁶
    * div R_i` ppm), then column factors against the row-adjusted
    * column sums, final cell weight `a_i·b_j div 10⁶` — all integer,
    * so the oracle replays the sweep bit for bit; the achieved column
    * margin is emitted as the convergence evidence (rows drift after
    * the column sweep — that residual IS what iteration would fix).
    *
    * Scale shape: one combinable (source, lang) count folds the
    * corpus; everything else runs on the |sources|×|langs| cell grid.
    */
  def ipfRaking(docs: DataFrame, srcCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    val cells = docs
      .where(col(srcCol).isNotNull && col(langCol).isNotNull)
      .groupBy(col(srcCol).as("src"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // margins + two sweeps all read it
    val tot = cells.agg(sum("n").as("total"),
      countDistinct("src").as("n_src"),
      countDistinct("lang").as("n_lang"))
    val rows = cells.groupBy("src").agg(sum("n").as("row_n"))
    val a = rows.crossJoin(broadcast(tot))
      .select(col("src"),
        expr("total div n_src * 1000000 div row_n").as("a_ppm"))
    val afterRow = cells.join(broadcast(a), "src")
      .withColumn("w1_micro", expr("n * a_ppm"))
    val colSums = afterRow.groupBy("lang")
      .agg(sum("w1_micro").as("col_micro"))
    val b = colSums.crossJoin(broadcast(tot))
      .select(col("lang"),
        expr("total div n_lang * 1000000000000 div col_micro")
          .as("b_ppm"))
    afterRow.join(broadcast(b), "lang")
      .withColumn("w_ppm", expr("a_ppm * b_ppm div 1000000"))
      .withColumn("cell_micro", expr("n * w_ppm"))
      .withColumn("achieved_col_micro",
        sum(col("cell_micro")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")))
      .select("src", "lang", "n", "a_ppm", "b_ppm", "w_ppm",
        "achieved_col_micro")
      .orderBy("src", "lang")
  }

  /** FUZZY benchmark decontamination: flag corpus documents whose
    * shingle-set Jaccard against ANY eval document reaches
    * `threshold` — the near-duplicate complement of [[decontaminate]]
    * (which needs an exact shared shingle and misses lightly
    * paraphrased test leakage). Candidates come from MinHash-LSH
    * banding ACROSS the two corpora (a corpus doc and an eval doc
    * agreeing on any full signature band), then exact Jaccard over
    * the hashed shingle sets verifies each candidate — approximate
    * recall, exact precision, same contract as
    * [[DocDedup.minhashLsh]] whose signature/banding kernels this op
    * reuses (`minhash_state`, `bandKeys`).
    *
    * Returns one row per CONTAMINATED corpus doc: how many eval docs
    * it matched, the smallest matching eval id, and the best Jaccard
    * in micro-units (exact integers — `⌊inter·10⁶/union⌋`).
    *
    * Scale shape: the eval side is benchmark-sized by contract, so
    * its banded signatures broadcast — the 100 TB corpus streams
    * map-side through the band join carrying only (doc_id, band, bh);
    * shingle sets rejoin by id AFTER candidate dedup (the eval side's
    * via a second broadcast), so replication never carries payload.
    * The only wide shuffle is the per-doc verdict aggregation,
    * map-side combinable and keyed by doc id.
    */
  /** Eval-side contamination overlap report (the GPT-3 appendix-C
    * shape, word-n-gram form): for each EVAL document, the fraction
    * (micro-units, exact floor) of its DISTINCT n-grams that appear
    * anywhere in the training corpus, plus the dirty verdict at
    * `dirtyPpm`. The complement of [[decontaminate]] /
    * [[fuzzyDecontaminate]], which flag CORPUS docs — this is the
    * report a benchmark owner reads to decide whether an eval split
    * is still trustworthy against a given corpus.
    *
    * Scale shape: the eval side is benchmark-sized by contract, so
    * its distinct gram set broadcasts; the 100 TB corpus streams
    * map-side through the broadcast semi-join carrying only the gram
    * string, and the surviving matched-gram set (bounded by the eval
    * vocabulary, not the corpus) is the only thing that shuffles.
    * The per-eval-doc aggregation is map-side combinable.
    */
  def contaminationOverlap(corpus: DataFrame, evalSet: DataFrame,
      n: Int = 3, dirtyPpm: Long = 100000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def gramRows(df: DataFrame, as: String) = {
      val t = split(col(textCol), " ")
      df.where(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as(as), t.as("t"))
        .where(size(col("t")) >= n)
        .select(col(as), explode(array_distinct(
          transform(sequence(lit(0), size(col("t")) - n),
            p => array_join(slice(col("t"), p + 1, lit(n)), " "))))
          .as("gram"))
    }
    val ev = gramRows(evalSet, "eval_id")
    val hit = gramRows(Par.spread(corpus), "doc_id")
      .join(broadcast(ev.select("gram").distinct()), Seq("gram"))
      .select("gram").distinct()
    ev.join(hit.withColumn("h", lit(1L)), Seq("gram"), "left")
      .groupBy("eval_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("h"), lit(0L))).as("hit_grams"))
      .withColumn("overlap_ppm", ppmFloor(col("hit_grams"), col("n_grams")))
      .withColumn("dirty", col("overlap_ppm") >= dirtyPpm)
      .orderBy("eval_id")
  }

  /** Pairwise source-overlap audit: for every unordered source pair,
    * the exact Jaccard (micro-units) between their distinct word
    * n-gram vocabularies plus both directed containments — the
    * corpus-audit view that tells a mixture designer which sources
    * are near-copies before [[mixturePlan]] weights them.
    *
    * Scale shape: the only corpus-wide work is the distinct
    * (source, gram) projection and one aggregation keyed by gram that
    * collects the gram's source SET (bounded by #sources, a spec
    * constant — never corpus-sized). Pairs expand per gram from that
    * array (≤ S² rows each), so no gram-keyed self-join of the corpus
    * against itself ever happens; the pair aggregation and the size
    * joins are planning-table-sized.
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 3,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    val t = split(col(textCol), " ")
    val sg = Par.spread(docs)
      .where(col(textCol).isNotNull && col(srcCol).isNotNull)
      .select(col(srcCol).as("src"), t.as("t"))
      .where(size(col("t")) >= n)
      .select(col("src"), explode(array_distinct(
        transform(sequence(lit(0), size(col("t")) - n),
          p => array_join(slice(col("t"), p + 1, lit(n)), " "))))
        .as("gram"))
      .distinct()
    val sizes = sg.groupBy("src").agg(count(lit(1)).as("n_grams"))
    val ss = sort_array(collect_set(col("src")))
    val pairs = sg.groupBy("gram").agg(ss.as("ss"))
      .where(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + lit(2),
          size(col("ss"))), b => struct(a.as("src_a"), b.as("src_b"))))))
        .as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.select(col("src").as("src_a"),
        col("n_grams").as("na"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("src").as("src_b"),
        col("n_grams").as("nb"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("na"), col("nb"),
        col("inter"),
        ppmFloor(col("inter"), col("na") + col("nb") - col("inter"))
          .as("jaccard_ppm"),
        ppmFloor(col("inter"), col("na")).as("contain_a_ppm"),
        ppmFloor(col("inter"), col("nb")).as("contain_b_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** [[decontaminate]]'s 100 TB-scale path: a Bloom prefilter in
    * front of the exact verify join. The eval side's distinct gram
    * set aggregates into ONE serialized Bloom filter (Spark's own
    * runtime-filter sketch, surfaced as `bloom_agg`), which rides the
    * corpus scan as a plan literal — the probe is a map-only,
    * codegen'd predicate, so only grams the filter admits (the eval
    * vocabulary plus its false positives, a fraction set by
    * `numBits`) ever reach the broadcast verify join. False
    * positives die at the verify, so the OUTPUT is exactly
    * [[decontaminate]]'s: approximate pruning, exact result — which
    * is why this op still carries a full oracle.
    *
    * The eval side is benchmark-sized by contract; building its
    * filter is one bounded aggregation and a driver pull of
    * `numBits/8` bytes (1 MiB at the default), the same class as the
    * audited query-vector collects.
    */
  def bloomDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      n: Int = 3, minHits: Long = 1L, estItems: Long = 1L << 20,
      numBits: Long = 1L << 23, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def gramRows(df: DataFrame, as: String) = {
      val t = split(col(textCol), " ")
      df.where(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as(as), t.as("t"))
        .where(size(col("t")) >= n)
        .select(col(as), explode(array_distinct(
          transform(sequence(lit(0), size(col("t")) - n),
            p => array_join(slice(col("t"), p + 1, lit(n)), " "))))
          .as("gram"))
    }
    val ev = gramRows(evalSet, "eval_id").localCheckpoint()
    val bf: Array[Byte] = ev.select("gram").distinct()
      .agg(call_function("bloom_agg", col("gram"),
        lit(estItems), lit(numBits)).as("bf"))
      .head.getAs[Array[Byte]](0)
    val pre = gramRows(Par.spread(corpus), "doc_id")
      .where(call_function("bloom_might_contain", lit(bf), col("gram")))
    pre.join(broadcast(ev), Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("hit_shingles"),
        min(col("eval_id")).as("eval_hit"))
      .where(col("hit_shingles") >= minHits)
      .orderBy("doc_id")
  }

  /** Epoch allocation under a token budget with geometrically
    * diminishing returns — the data-constrained-scaling question
    * (Muennighoff et al. 2023): given each source's token count, how
    * many REPEAT epochs does each source get when every further
    * epoch of the same data is worth half the previous one?
    * Greedy by marginal value: candidate (source, epoch k ≤
    * `maxEpochs`) pairs carry value `n_tokens · 2^(maxEpochs−k)`
    * (exact integers, same ordering as n/2^(k−1)) and cost
    * `n_tokens`; picks happen in (value desc, source, epoch) order
    * until the budget runs out, the boundary pick taking whatever
    * remains. Halving guarantees epoch k of a source always
    * outranks its epoch k+1, so allocations are contiguous without
    * an explicit constraint.
    *
    * Returns the picked rows: `(source, epoch, n_tokens,
    * value_scaled, cum_before, alloc_tokens)`. The candidate table
    * is #sources × maxEpochs — a PLANNING artifact, so its
    * single-partition cumulative window is bounded by spec count,
    * never by corpus size (the one full-corpus pass is the
    * map-combinable per-source token sum).
    */
  def epochAllocation(docs: DataFrame, budgetTokens: Long,
      maxEpochs: Int = 8, textCol: String = "text",
      srcCol: String = "source"): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 32,
      s"maxEpochs wants 1..32, got $maxEpochs")
    val perSrc = Par.spread(docs)
      .where(col(textCol).isNotNull && col(srcCol).isNotNull)
      .groupBy(col(srcCol).as("src"))
      .agg(sum(size(split(col(textCol), " "))).cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("value_scaled").desc, col("src"), col("epoch"))
      .rowsBetween(Long.MinValue, -1)
    perSrc
      .select(col("src"), col("n_tokens"),
        explode(sequence(lit(1), lit(maxEpochs))).as("epoch"))
      .withColumn("value_scaled",
        expr(s"n_tokens * shiftleft(CAST(1 AS BIGINT), $maxEpochs - epoch)"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least(col("n_tokens"),
          lit(budgetTokens) - col("cum_before"))))
      .where(col("alloc_tokens") > 0)
      .orderBy(col("value_scaled").desc, col("src"), col("epoch"))
  }

  /** C4-style duplicate-span removal (Raffel et al. 2020 §2.2,
    * word-n-gram form — this corpus has no sentence structure):
    * every occurrence of an n-token span whose exact text appeared
    * EARLIER in the corpus (global (doc, position) order, first
    * occurrence wins) is removed; a token goes when ANY removed span
    * covers it. Returns the rewritten corpus —
    * `(doc_id, n_tokens, n_kept, n_removed, kept_text)` — where
    * [[dupSpanStats]] only reports. Deterministic: the keeper of a
    * span is `min(struct(doc_id, pos))` — true lexicographic
    * (doc, position) order, safe for documents of ANY token count (an
    * arithmetic `doc_id·10⁶ + pos` encoding would collide across
    * documents past 10⁶ tokens and overflow past doc_id ~9.2e12 —
    * real hazards in a 100 TB corpus).
    *
    * Scale shape: the first-occurrence table is one map-combinable
    * MIN keyed by the gram; the join back re-distributes by gram (a
    * hot span costs fan-out proportional to its occurrence count,
    * same as any global dedup); coverage explode is bounded by n per
    * duplicate; the rebuild aggregation is keyed by doc. No driver
    * state, no collect.
    */
  def removeDupSpans(docs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = Par.spread(docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        split(col(textCol), " ").as("t")))
      .localCheckpoint()
    val grams = base.where(size(col("t")) >= n)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("t")) - n),
          p => array_join(slice(col("t"), p + 1, lit(n)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))
    val first = grams.groupBy("gram")
      .agg(min(struct(col("doc_id"), col("pos"))).as("fk"))
    val removedPos = grams.join(first, Seq("gram"))
      .where(col("doc_id") =!= col("fk.doc_id") ||
        col("pos") =!= col("fk.pos"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
    val kept = base
      .select(col("doc_id"), posexplode(col("t")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
      .join(removedPos, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("kept_text"))
    base.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
      .orderBy("doc_id")
  }

  def fuzzyDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      thresholdPpm: Long = 500000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val rows = numHashes / bands
    val mh = call_function("minhash_state",
      split(col(textCol), " "), lit(n), lit(numHashes))
    def sigs(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), mh.as("mh"))
      .select(col(as), col("mh.sh").as("sh"), col("mh.sig").as("sig"))
      .where(size(col("sh")) > 0)
    def banded(df: DataFrame, as: String) = df
      .select(col(as), explode(DocDedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col(as), col("bk.band").as("band"), col("bk.bh").as("bh"))
    // eval is read twice (bands, then shingle rejoin) — materialize
    // once; corpus signatures stream straight through the band join
    val evS = sigs(evalSet, "eval_id").localCheckpoint()
    val coS = sigs(Par.spread(corpus), "doc_id")
    val cand = banded(coS, "doc_id")
      .join(broadcast(banded(evS, "eval_id")), Seq("band", "bh"))
      .select("doc_id", "eval_id").dropDuplicates("doc_id", "eval_id")
    coS.select(col("doc_id"), col("sh").as("sha"))
      .join(cand, Seq("doc_id"))
      .join(broadcast(evS.select(col("eval_id"), col("sh").as("shb"))),
        Seq("eval_id"))
      // sh is sorted-distinct (kernel contract): two-pointer count
      .withColumn("inter",
        call_function("sorted_intersect_count", col("sha"), col("shb")))
      .withColumn("jac_ppm", ppmFloor(col("inter"),
        (size(col("sha")) + size(col("shb"))).cast("long") - col("inter")))
      .where(col("jac_ppm") >= thresholdPpm)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"), min(col("eval_id")).as("eval_hit"),
        max(col("jac_ppm")).as("best_jac_ppm"))
      .orderBy("doc_id")
  }

  /** Default tracking-param killset for [[canonicalUrl]]: a regex
    * over the `name=`-prefix of each query param. Overridable — real
    * crawls carry site-specific junk params beyond the common four.
    */
  val DefaultTrackingParamRegex: String = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Percent-encoding normalization per RFC 3986 §6.2.2: DECODE
    * escapes of unreserved characters (ALPHA / DIGIT / `-` `.` `_`
    * `~` — `%41`→`A`, `%7e`→`~`), and UPPERCASE the hex digits of
    * every escape that must stay encoded (`%2f`→`%2F` — reserved
    * chars keep their escape, two hex casings must not split a
    * canonical key). Malformed escapes (`%G1`, trailing `%`) pass
    * through verbatim — lax, never corrupting. Pure column program:
    * split on a `(?=%)` lookahead, per-token decode/uppercase under
    * `transform`, rejoin — map-only under codegen like the rest of
    * the canonicalizer.
    */
  private def normalizePercent(u: Column): Column = {
    val toks = split(u, "(?=%)")
    array_join(transform(toks, t => {
      val hex = upper(substring(t, 2, 2))
      val code = conv(hex, 16, 10).cast("int")
      val unreserved =
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
          (code >= 48 && code <= 57) || code.isin(45, 46, 95, 126)
      val rest = substring(t, 4, Int.MaxValue)
      when(t.rlike("^%[0-9A-Fa-f]{2}"),
        when(unreserved, concat(call_function("char", code), rest))
          .otherwise(concat(lit("%"), hex, rest)))
        .otherwise(t)
    }), "")
  }

  /** Canonical form of a web URL — the normalization every
    * crawl-scale URL-dedup pass applies before keying (CommonCrawl /
    * FineWeb pipelines dedup fetched pages by canonical URL before
    * any content hash):
    *   - fragment dropped FIRST (so a `?` hiding inside a fragment —
    *     `/p#f?x=1` — is never mistaken for a query)
    *   - percent-encoding normalized (RFC 3986 §6.2.2: unreserved
    *     escapes decoded, surviving escapes hex-uppercased) — decoded
    *     chars are never URL delimiters, so parsing is unaffected
    *   - scheme and host lowercase; default port stripped
    *     (`:80` for http, `:443` for https)
    *   - tracking query params dropped (`trackingParamRegex`, default
    *     [[DefaultTrackingParamRegex]]), remaining params SORTED so
    *     param order never splits a key; empty query drops its `?`
    *   - empty path becomes `/`
    * Evaluates as ONE codegen'd native expression
    * ([[graft.functions.CanonicalizeUrl]]) — one kernel call per row
    * riding the scan map-only. The original column program
    * ([[canonicalUrlColumnar]]) inlined its interpreted
    * percent-decode HOF once per downstream reference (~8× per row);
    * it survives as the differential-spec reference. Malformed input
    * degrades gracefully: no `scheme://` match → empty host, the row
    * keys by whatever parsed.
    *
    * IDN contract: hosts canonicalize in their WIRE form (lowercased
    * byte-wise). A Unicode host and its punycode (`xn--`) twin do NOT
    * merge — per RFC 3986 they are different authorities until an
    * IDNA mapping is applied; crawlers fetching IDN domains should
    * pre-encode hosts to punycode (`java.net.IDN.toASCII`) upstream,
    * once per URL at ingest, before keying.
    */
  def canonicalUrl(url: Column,
      trackingParamRegex: String = DefaultTrackingParamRegex): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CanonicalizeUrl(
        org.apache.spark.sql.graft.ColumnBridge.expression(url),
        org.apache.spark.sql.catalyst.expressions.Literal(
          trackingParamRegex)))

  /** The original pure-column canonicalizer (regexp_extract + array
    * HOFs) — bit-exact with [[canonicalUrl]] by the differential
    * property spec, kept as the executable semantics reference (it IS
    * the program the native kernel must match).
    */
  private[graft] def canonicalUrlColumnar(url: Column,
      trackingParamRegex: String = DefaultTrackingParamRegex): Column = {
    val u = normalizePercent(regexp_extract(url, "^([^#]*)", 1))
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .otherwise(rawHost)
    val rawPath = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val q = regexp_extract(u, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(trackingParamRegex)))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Crawl-frontier politeness schedule: order fetches so same-host
    * URLs never cluster — each host's k-th URL lands at global
    * position `(k − 1) · H + host_index` (H = distinct hosts), i.e.
    * strict round-robin across hosts with spacing exactly H between
    * consecutive same-host fetches: the per-host crawl-delay cadence
    * every polite crawler enforces, expressed as a TOTAL ORDERING
    * instead of a scheduler queue (a partitioned fetch fleet just
    * range-splits the position). Ties inside a host break on `idCol`;
    * ragged hosts leave gaps in the sequence (it is an ordering key,
    * not a row number — the curriculumOrder contract).
    *
    * Returns `(id, host, host_index, rank_in_host, fetch_pos)`
    * ordered by `fetch_pos`.
    *
    * `delays` (optional) is a `(host, crawl_delay)` frame —
    * [[crawlDelays]] output — giving per-host MINIMUM spacing in
    * slots: a delayed host's stride becomes `max(H, crawl_delay)`,
    * so its consecutive fetches sit ≥ crawl_delay positions apart
    * while undelayed hosts keep the plain round-robin. Per-host
    * spacing guarantees survive; global positions may collide across
    * hosts with different strides (fetch_pos stays an ORDERING key —
    * ties are harmless to politeness, which is a same-host property).
    *
    * Scale shape: within-host ranks come from [[Par.prefixSum]]'s
    * range-shuffle scan — never a per-host window sort of the URL
    * table; the host-index table is |hosts| rows (a planning table:
    * frontiers hold millions of URLs over thousands of hosts), ranked
    * by the same parallel prefix sum and broadcast back into the URL
    * stream with the host count; the delay table joins broadcast on
    * host (it is ≤ |hosts| rows by construction).
    */
  def frontierSchedule(urls: DataFrame, hostCol: String = "host",
      idCol: String = "id",
      delays: Option[DataFrame] = None): DataFrame = {
    val t = Par.spread(urls.where(col(hostCol).isNotNull))
      .select(col(idCol).cast("long").as("id"),
        col(hostCol).cast("string").as("host"))
    // Host ordinal via the range-shuffle prefix-sum scan, NEVER a
    // global Window.orderBy("host"): 10⁶-10⁷ distinct hosts through
    // one unpartitioned window task was the crawl front's last
    // single-partition bottleneck. prefixSum ranks each range
    // partition locally and stitches with driver-side partition
    // offsets, so the ordinal is dense, host-ordered, and parallel.
    val hIdx = Par.prefixSum(
        t.select("host").distinct().withColumn("one", lit(1L)),
        Nil, Seq("host"), "one", outCol = "host_rank")
      .select(col("host"), (col("host_rank") - 1L).as("host_index"))
    val hCount = hIdx.agg(count(lit(1)).as("h"))
    val ranked = Par.prefixSum(t.withColumn("one", lit(1L)),
        Seq("host"), Seq("id"), "one", outCol = "rank_in_host")
      .join(broadcast(hIdx), Seq("host"))
      .crossJoin(broadcast(hCount))
    val withStride = delays match {
      case Some(d) =>
        // delay lookup is case-insensitive on BOTH sides (hosts are
        // case-insensitive per RFC 3986): a mixed-case probe host must
        // not silently lose its crawl-delay stride
        val dl = d.select(lower(col("host")).as("dl_host"),
          col("crawl_delay").cast("long").as("crawl_delay"))
        ranked.join(broadcast(dl),
            lower(col("host")) === col("dl_host"), "left")
          .drop("dl_host")
          .withColumn("stride",
            greatest(col("h"), coalesce(col("crawl_delay"), lit(0L))))
      case None => ranked.withColumn("stride", col("h"))
    }
    withStride
      .withColumn("fetch_pos",
        (col("rank_in_host") - 1L) * col("stride") + col("host_index"))
      .select("id", "host", "host_index", "rank_in_host", "fetch_pos")
      .orderBy("fetch_pos")
  }

  /** IDN host pre-encoding — the upstream half of [[canonicalUrl]]'s
    * documented IDN contract: hosts canonicalize in WIRE form, so a
    * Unicode host and its punycode twin only merge if the crawler
    * punycode-encodes at ingest. This is that ingest step: rewrite
    * the URL's host through `java.net.IDN.toASCII` (RFC 3490 ToASCII
    * per label — BÜCHER.example and xn--bcher-kva.example both land
    * on xn--bcher-kva.example), leaving scheme/path/query/fragment
    * byte-identical. All-ASCII hosts pass through unchanged (case is
    * [[canonicalUrl]]'s job); a host ToASCII rejects (empty label,
    * oversize) keeps its original URL — lax, never corrupting.
    *
    * A driver-grade UDF by design: it runs ONCE per URL at ingest
    * (cold path), never inside the dedup kernels — the canonical-key
    * programs stay pure codegen'd column work.
    */
  def idnAsciiUrl(url: Column): Column =
    udf((u: String) => IdnFn.asciiUrl(u)).apply(url)

  /** URL-keyed exact dedup over [[canonicalUrl]]: the keeper of each
    * canonical key is the smallest id (first fetch wins), every other
    * row flags `is_dup`. Returns `(id, canonical_url, keeper_id,
    * is_dup)`.
    *
    * Scale shape — salted two-phase keeper, straggler bound
    * O(rows/`salts`): canonicalization is one codegen'd kernel call
    * riding the scan; the big shuffle keys `(canonical_url, salt)`
    * with `salt = xxhash64(id) mod salts`, so a viral hot URL spreads
    * over `salts` tasks instead of landing every row in one. Phase 1
    * is a window MIN per `(key, salt)`; phase 2 aggregates those
    * partial minima to the global keeper (map-side combine shrinks it
    * to ≤ keys·salts rows before its tiny shuffle), replicates it per
    * salt, and joins back on `(key, salt)`. The probe side never
    * recomputes: the optimizer prunes the probe's window (its
    * `part_min` is unused downstream), so the probe is the spread
    * exchange directly, and BOTH branches hang off that one exchange
    * — AQE stage reuse (`ReusedExchange` in the executed plan, pinned
    * by PlanSpec) means the input is scanned and canonicalized
    * exactly once; the keeper side broadcasts at verified scale. The
    * unsalted window MIN this replaces put every row of one canonical
    * URL in a single task — correct, one shuffle, but unbounded on a
    * hot key.
    */
  def urlKeyDedup(df: DataFrame, urlCol: String = "url",
      idCol: String = "event_id", salts: Int = 16): DataFrame = {
    require(salts >= 1, s"urlKeyDedup needs salts >= 1, got $salts")
    // ONE kernel call per row (r12 plan audit found two), by two moves:
    //   - KnownNotNull on BOTH join keys — truthful (url is filtered
    //     non-null and the kernel never returns null for non-null
    //     input; pmod with a constant non-zero divisor never returns
    //     null), and load-bearing twice over: the join infers NO
    //     isnotnull(...) filters from non-nullable keys, so (a) the
    //     kernel is never re-evaluated inside a pushed scan filter,
    //     and (b) the probe and keeper branches get IDENTICAL filter
    //     conjuncts — the keeper's exploded salt is born non-null, so
    //     a nullable probe salt would add a probe-only conjunct that
    //     breaks subtree identity and with it exchange reuse;
    //   - the canonical projection sits BELOW the spread exchange,
    //     not above it: both branches hang off that exchange, and
    //     AQE's stage reuse dedups the exchange and everything UNDER
    //     it — a projection above the exchange runs once per BRANCH,
    //     under it once per ROW.
    def notNull(c: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.KnownNotNull(
          org.apache.spark.sql.graft.ColumnBridge.expression(c)))
    val t = Par.spread(df.where(col(urlCol).isNotNull)
        .select(col(idCol).cast("long").as("id"),
          notNull(canonicalUrl(col(urlCol))).as("canonical_url"),
          notNull(pmod(xxhash64(col(idCol).cast("long")), lit(salts.toLong)))
            .as("salt")))
    val part = t.withColumn("part_min", min(col("id")).over(
      Window.partitionBy("canonical_url", "salt")))
    // global keeper from the partial minima, replicated to every salt
    // so the rejoin keys (canonical_url, salt) and inherits the
    // window's partitioning — inner join is lossless by construction
    // (every salt value is present on the build side)
    val keeper = part.groupBy("canonical_url")
      .agg(min(col("part_min")).as("keeper_id"))
      .select(col("canonical_url"),
        explode(sequence(lit(0L), lit(salts.toLong - 1L))).as("salt"),
        col("keeper_id"))
    part.join(keeper, Seq("canonical_url", "salt"))
      .select(col("id"), col("canonical_url"), col("keeper_id"),
        (col("id") =!= col("keeper_id")).as("is_dup"))
      .orderBy("id")
  }

  /** Blocklist gate: drop rows whose host IS a listed domain or is a
    * subdomain of one. `blocklist` is a one-column `domain` frame
    * (lowercased on entry) — blocklist-as-data, never a folded
    * predicate chain (a 10⁶-domain list as per-row predicates would
    * be O(|blocklist|) per row AND recompile the plan on every list
    * change). This is THE gate: [[graft.streaming.StreamingPipeline
    * .urlGateStream]], `CrawlMain`, and the q397 pipeline all
    * delegate here — one copy, no drift.
    *
    * Scale shape: subdomain matching stays EQUI-join-able by keying
    * on label-suffixes — one stream-static-legal broadcast LEFT ANTI
    * join per label depth, each keyed `last-k-labels(host) = domain`.
    * Per-row cost is O(#depths) hash probes, independent of
    * blocklist size.
    *
    * `depths` picks the label depths to probe. Empty (the batch
    * default) probes the blocklist's DISTINCT label counts — a
    * bounded driver aggregate (real blocklists hold 2-5-label
    * domains) re-evaluated each plan build, so it always covers the
    * current list. Streaming callers pass a FIXED range instead
    * (e.g. `1 to 8`): the depth set is baked into the plan at stream
    * start, so a later list swap that introduces a brand-new label
    * depth still gates correctly as long as it falls inside the
    * range — the contract the fixed range buys. Domains deeper than
    * every probed depth match nothing (each depth's anti-join build
    * side is just the domains AT that depth).
    */
  def blocklistGate(df: DataFrame, blocklist: DataFrame, hostCol: Column,
      depths: Seq[Int] = Nil): DataFrame = {
    val bl = blocklist.select(lower(col("domain")).as("domain"))
      .withColumn("k", size(split(col("domain"), "\\.")))
    val ks =
      if (depths.nonEmpty) depths.distinct.sorted
      else bl.select("k").distinct().collect().map(_.getInt(0)).sorted.toSeq
    // probe side lowercased to match the lowercased blocklist: hosts
    // are case-insensitive (RFC 3986) and a mixed-case caller must not
    // silently bypass the gate
    val hostLabels = split(lower(hostCol), "\\.")
    ks.foldLeft(df) { (acc, k) =>
      // last-k labels of the host; a host with < k labels can't match
      // a k-label domain — key it "" (matches nothing, lazily guarded)
      val sfx = when(size(hostLabels) >= k,
        array_join(slice(hostLabels, -k, k), ".")).otherwise(lit(""))
      // dataframe-qualified join key: a caller frame that itself
      // carries a `domain` column must not make the condition
      // ambiguous
      val d = bl.where(col("k") === k).select("domain")
      acc.join(broadcast(d), sfx === d("domain"), "left_anti")
    }
  }

  /** Competence-based curriculum ordering (Platanios et al. 2019
    * shape, length-as-difficulty): documents are cut into `bands`
    * difficulty bands by linear token-count binning against the
    * corpus max, ranked easy-first WITHIN each band, and interleaved
    * round-robin ACROSS bands into one global training order —
    * `curriculum_pos = (band_rank − 1)·bands + band` — so every
    * training window sees the full difficulty mixture while still
    * trending easy→hard inside each band. Ragged bands leave gaps in
    * the position sequence (it is an ORDERING key, not a row number);
    * ties break on doc id, all integer, engine-portable.
    *
    * Returns `(doc_id, n_tokens, band, band_rank, curriculum_pos)`
    * ordered by `curriculum_pos`.
    *
    * Scale shape: the corpus max is one combinable scalar aggregate
    * (broadcast back via crossJoin); band ranks come from
    * [[Par.prefixSum]]'s two-pass range-shuffle scan — NEVER a
    * `Window.partitionBy(band)` whose B giant partitions would each
    * sort a corpus/B slice on one task at 100 TB. The final orderBy
    * is the output contract (a training order IS a sort).
    */
  def curriculumOrder(docs: DataFrame, bands: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(bands >= 1 && bands <= 1024, s"bands wants 1..1024, got $bands")
    val t = Par.spread(docs.where(col(textCol).isNotNull))
      .select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    val mx = t.agg(max(col("n_tokens")).as("mx"))
    val banded = t.crossJoin(broadcast(mx))
      .withColumn("band", least(lit(bands - 1),
        expr(s"n_tokens * ${bands}L div (mx + 1L)")).cast("int"))
      .withColumn("one", lit(1L))
    Par.prefixSum(banded, Seq("band"), Seq("n_tokens", "doc_id"), "one",
        outCol = "band_rank")
      .withColumn("curriculum_pos",
        (col("band_rank") - 1L) * bands + col("band"))
      .select("doc_id", "n_tokens", "band", "band_rank", "curriculum_pos")
      .orderBy("curriculum_pos")
  }

  /** DSIR-shaped data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus
    * document by how much its hashed-feature profile looks like a
    * TARGET domain sample relative to the corpus itself, and keep the
    * top `topN`. Features are unigram words hashed into `buckets`
    * buckets via the engine-portable base-37 fold (the q22 kernel);
    * both distributions are add-1-smoothed bucket counts, and the
    * per-token importance weight is the exact integer ratio
    * `λ_b = ((t_b + 1) · 1e6) div (r_b + 1)` — the log-free integer
    * twin of DSIR's hashed-ngram log-likelihood ratio (same
    * bucketing, same two-distribution estimator; a floor-division ppm
    * instead of a float log, so the oracle replays every bit). A
    * document's score is the floor-mean of its tokens' weights.
    *
    * Returns the top `topN` corpus docs as `(doc_id, n_tokens,
    * score)`, score-desc then doc_id-asc.
    *
    * Scale shape: per-doc bucket profiles are ONE combinable
    * aggregate over the token stream (profile cardinality ≤ token
    * count, usually ≪); both distribution estimates reduce the
    * PROFILES, never the raw stream twice; the weight table is
    * exactly `buckets` rows and BROADCASTS into the profile join (the
    * 100 TB side never shuffles for it); the final top-N is
    * TakeOrderedAndProject, never a global sort.
    */
  /** Per-doc hashed-unigram bucket profile — the shared scan of the
    * DSIR family ([[dsirSelect]], [[dsirWeights]]).
    */
  private def dsirProfile(df: DataFrame, buckets: Int,
      textCol: String, idCol: String): DataFrame = {
    val h37 = "aggregate(filter(split(w, ''), c -> c <> ''), 0L, " +
      "(a, c) -> (a * 37 + ascii(c)) % 2147483647)"
    Par.spread(df)
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(filter(split(col(textCol), " "), w => w =!= "")).as("w"))
      .withColumn("bucket", expr(h37) % buckets.toLong)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
  }

  /** λ from two profile aggregates: add-1-smoothed integer ratio per
    * bucket, complete over all `buckets` rows.
    */
  private def dsirWeightsFrom(prof: DataFrame, target: DataFrame,
      buckets: Int, textCol: String, idCol: String): DataFrame = {
    val tc = dsirProfile(target, buckets, textCol, idCol)
      .groupBy("bucket").agg(sum("c").as("tc"))
    val rc = prof.groupBy("bucket").agg(sum("c").as("rc"))
    prof.sparkSession.range(buckets.toLong)
      .select(col("id").as("bucket"))
      .join(tc, Seq("bucket"), "left")
      .join(rc, Seq("bucket"), "left")
      .select(col("bucket"), expr(
        "((coalesce(tc, 0L) + 1L) * 1000000L) div (coalesce(rc, 0L) + 1L)")
        .as("lam"))
  }

  /** The DSIR weight table alone — `(bucket, λ)`, exactly `buckets`
    * rows — as a BATCH ARTIFACT for serving paths that score away
    * from the corpus that trained it (the streaming gate
    * [[graft.streaming.StreamingPipeline.dsirGateStream]] broadcasts
    * it into a crawl stream; persisting it beside the lake is the
    * same story as the IVF index).
    */
  def dsirWeights(corpus: DataFrame, target: DataFrame,
      buckets: Int = 1024,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    dsirWeightsFrom(dsirProfile(corpus, buckets, textCol, idCol),
      target, buckets, textCol, idCol)
  }

  // ── Robots.txt (RFC 9309) crawl gate ──────────────────────────────

  /** Parse raw robots.txt bodies into one rule row per
    * `(host, group, agent, rule)`: field names match
    * case-insensitively, `#` starts a comment anywhere on a line,
    * CRLF is tolerated, consecutive `User-agent` lines form ONE group
    * head whose rules bind to every named agent, rules before any
    * group head are ignored (RFC 9309 §2.2.1), and empty-pattern
    * `Allow:` / `Disallow:` lines (the "no restriction" spelling) are
    * dropped — an empty pattern matches nothing, it does not
    * zero-length-match everything. Two groups naming the same agent
    * merge naturally at match time (both groups' rows join back to
    * the agent). Each surviving rule carries `pattern_len` (the RFC's
    * longest-match octet count) and `pattern_re` — the wildcard
    * pattern compiled to a start-anchored regex (`*` → `.*`, a
    * trailing `$` → end anchor, everything else literal) that
    * [[robotsGate]] evaluates against the path?query match target.
    *
    * Scale shape: one window per host ordered by line number — a
    * robots.txt is capped at 500 KiB by the RFC (crawlers truncate
    * beyond it), so the per-host sort is bounded by contract, and the
    * output is a planning table of |hosts|·rules rows, orders of
    * magnitude below the URL stream it gates.
    */
  def parseRobots(robots: DataFrame, hostCol: String = "host",
      textCol: String = "body"): DataFrame = {
    val (agents, entries) = robotsGroups(robots, hostCol, textCol)
    val rules = entries.where(col("key").isin("allow", "disallow") &&
        col("value") =!= "")
      .select(col("host"), col("gid"), col("key").as("rule"),
        col("value").as("pattern"))
    // pattern → anchored regex: escape every metachar except '*',
    // then '*' → '.*', then a TRAILING escaped '$' back to an anchor
    val esc = regexp_replace(col("pattern"),
      """([.\[\]{}()+?^$\\|])""", """\\$1""")
    val starred = regexp_replace(esc, """\*""", ".*")
    val anchored = regexp_replace(starred, """\\\$$""", """\$""")
    agents.join(rules, Seq("host", "gid"))
      .select(col("host"), col("gid"), col("agent"), col("rule"),
        col("pattern"), length(col("pattern")).as("pattern_len"),
        concat(lit("^"), anchored).as("pattern_re"))
  }

  /** The line→group core shared by [[parseRobots]] and
    * [[crawlDelays]]: hosts keyed lowercase (the verdict side
    * lowercases the URL's authority), `#` comments stripped anywhere
    * on a line, CRLF tolerated, consecutive `User-agent` lines
    * forming ONE group head, pre-group lines ignored (RFC 9309
    * §2.2.1). Returns `(agents, entries)`: the per-group agent names
    * and the in-group non-UA field lines as `(host, gid, key,
    * value)`. One bounded per-host window (robots.txt is capped at
    * 500 KiB by the RFC).
    *
    * Group-splitting semantics (pinned by CurationSpec): ANY kept
    * non-UA line — including `Crawl-delay` — ends the group head, so
    * `User-agent: a / Crawl-delay: 1 / User-agent: b / Disallow: /x`
    * binds the Disallow to `b` ONLY. This matches Google's parser
    * (non-UA directives terminate the start-of-group run); a parser
    * that ignored Crawl-delay entirely would bind the Disallow to
    * both a and b.
    */
  private def robotsGroups(robots: DataFrame, hostCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val lines = robots.select(lower(col(hostCol)).as("host"),
        posexplode(split(regexp_replace(col(textCol), "\r", ""), "\n"))
          .as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("key",
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)))
      .where(col("key").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    val wLn = Window.partitionBy("host").orderBy("ln")
    val grouped = lines
      .withColumn("is_ua", (col("key") === "user-agent").cast("int"))
      // a UA line STARTS a group unless the previous kept line was
      // also UA — consecutive UA lines share one group head
      .withColumn("starts", (col("is_ua") === 1 &&
        coalesce(lag(col("is_ua"), 1).over(wLn), lit(0)) === 0).cast("int"))
      .withColumn("gid", sum(col("starts")).over(wLn))
    val agents = grouped.where(col("is_ua") === 1)
      .select(col("host"), col("gid"), lower(col("value")).as("agent"))
    val entries = grouped.where(col("is_ua") === 0 && col("gid") > 0)
      .select(col("host"), col("gid"), col("key"), col("value"))
    (agents, entries)
  }

  /** Per-host `Crawl-delay` for one crawler `agent` — the de-facto
    * extension reference-class crawlers honor alongside RFC 9309.
    * Group applicability matches [[robotsGate]]'s precedence: the
    * agent's own groups if the file names it anywhere on the host,
    * else the `*` groups; non-numeric values are dropped; when the
    * applicable groups carry several delays the LARGEST (most polite)
    * wins. Returns `(host, crawl_delay)` — hosts with no applicable
    * delay are absent, and [[frontierSchedule]] takes this frame
    * directly as its per-host minimum spacing.
    */
  def crawlDelays(robots: DataFrame, agent: String = "*",
      hostCol: String = "host", textCol: String = "body"): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val (agents, entries) = robotsGroups(robots, hostCol, textCol)
    val scoped = agents.where(col("agent").isin(a, "*"))
      .withColumn("is_spec", (col("agent") === a).cast("int"))
    val wh = Window.partitionBy("host")
    val applicable = scoped
      .withColumn("has_spec", max(col("is_spec")).over(wh))
      .where(col("is_spec") === col("has_spec"))
      .select("host", "gid").distinct()
    entries.where(col("key") === "crawl-delay")
      // try_cast: a malformed delay is a dropped line, not a crawl
      // abort (ANSI cast would fail the job on 'Crawl-delay: oops')
      .withColumn("delay", expr("try_cast(value AS BIGINT)"))
      .where(col("delay").isNotNull && col("delay") > 0L)
      .join(applicable, Seq("host", "gid"))
      .groupBy("host")
      .agg(max(col("delay")).as("crawl_delay"))
  }

  /** Crawler-trap detection by URL-template cardinality: calendar
    * pages, session-id paths, and faceted-search grids generate
    * unbounded URL spaces that a frontier must refuse to enumerate.
    * Each canonical URL's path is lifted to a TEMPLATE by collapsing
    * volatile segments — digits-only → `<n>`, long hex (ids, hashes,
    * ≥ 8 chars) → `<h>`, any other digit-bearing segment → `<x>` (the
    * check order matters: a digits-only segment is also long-hex) —
    * and a template whose distinct-URL count reaches `minUrls` is
    * flagged. Returns `(template, depth, n_urls, is_trap)` — the trap
    * list is itself crawl-front DATA (a broadcast anti-join on
    * template gates the frontier the same way the blocklist does).
    *
    * Scale shape: templating is a map-only column program riding the
    * scan (regex per segment inside `transform`); the only shuffle is
    * one count-distinct aggregate keyed by template — template
    * cardinality is orders of magnitude below URL cardinality (that
    * gap IS the trap signal).
    */
  def crawlerTraps(urls: DataFrame, minUrls: Long = 100L,
      urlCol: String = "url"): DataFrame = {
    require(minUrls >= 1L, s"minUrls must be positive, got $minUrls")
    templated(Par.spread(urls.where(col(urlCol).isNotNull)), urlCol)
      .groupBy("template", "depth")
      .agg(countDistinct(col("cu")).as("n_urls"))
      .withColumn("is_trap", col("n_urls") >= minUrls)
      .orderBy("template")
  }

  /** The consumption side of [[crawlerTraps]] — drop frontier URLs
    * whose path template is on the trap list, the same
    * list-as-DATA shape as [[blocklistGate]]: one broadcast LEFT
    * ANTI join keyed by template (the trap table is bounded by
    * template cardinality — a planning table), templating map-only
    * in the scan. Stream-static legal, so the same call gates a
    * live frontier.
    */
  def trapGate(urls: DataFrame, traps: DataFrame,
      urlCol: String = "url"): DataFrame =
    // the template is ONE expression (never intermediate named
    // columns): a caller frame already carrying `host`/`path`/`segs`
    // must come through untouched — only the reserved `__template`
    // key is added and dropped
    urls.where(col(urlCol).isNotNull)
      .withColumn("__template", templateCol(col(urlCol)))
      .join(broadcast(traps.where(col("is_trap"))
          .select(col("template").as("__template"))),
        Seq("__template"), "left_anti")
      .drop("__template")

  /** The template projection [[crawlerTraps]] and its streaming twin
    * share — map-only (stream-safe): canonical URL, host, collapsed
    * path template and its depth.
    */
  private[graft] def templated(urls: DataFrame, urlCol: String,
      keep: Seq[String] = Nil): DataFrame =
    urls.select(canonicalUrl(col(urlCol)).as("cu") +: keep.map(col): _*)
      .withColumn("tsegs", templateSegs(col("cu")))
      .withColumn("template", concat(
        regexp_extract(col("cu"), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
        lit("/"), array_join(col("tsegs"), "/")))
      .withColumn("depth", size(col("tsegs")).cast("long"))

  /** The collapsed path segments of a canonical URL — one expression,
    * no intermediate columns. */
  private def templateSegs(cu: Column): Column = {
    val path = regexp_extract(cu,
      "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    transform(filter(split(path, "/"), s => s =!= ""), s =>
      when(s.rlike("^[0-9]+$"), lit("<n>"))
        .when(s.rlike("^[0-9a-f]{8,}$"), lit("<h>"))
        .when(s.rlike("[0-9]"), lit("<x>"))
        .otherwise(s))
  }

  /** The full template of a RAW url as one expression ([[trapGate]]'s
    * collision-free probe). */
  private def templateCol(url: Column): Column = {
    val cu = canonicalUrl(url)
    concat(regexp_extract(cu, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1),
      lit("/"), array_join(templateSegs(cu), "/"))
  }

  /** Content-irrelevant query-param inference — LEARN the
    * canonicalizer's tracking-param killset from the fetch log
    * instead of hand-curating it. A param `k` is irrelevant on a host
    * when, within every CONTEXT (the URL with `k` removed: same stem,
    * same other params), varying `k`'s value never varies the
    * content hash; one context where content tracks the value is
    * relevance evidence. Returns per `(host, param)`:
    * `n_groups` (contexts carrying the param), `n_multi_value_groups`
    * (contexts that actually vary the value — the only ones that can
    * testify), `n_varying_groups` (contexts where content varied with
    * the value), and the verdict `irrelevant` = has testimony and
    * none of it shows variation. Params the default killset already
    * drops must still be analyzed, so canonicalization here keeps ALL
    * params (a never-matching killset regex).
    *
    * Scale shape: param explode is map-only (one row per URL×param);
    * both aggregations are combinable group-bys — (host, param,
    * context) then (host, param); context strings re-sort the
    * SURVIVING params so the grouping key is spelling-independent.
    */
  def paramRelevance(fetches: DataFrame, urlCol: String = "url",
      contentCol: String = "content_hash"): DataFrame = {
    val cu = canonicalUrl(col(urlCol), trackingParamRegex = "(?!x)x")
    val base = Par.spread(fetches.where(col(urlCol).isNotNull &&
        col(contentCol).isNotNull))
      .select(cu.as("cu"), col(contentCol).cast("string").as("h"))
      .withColumn("host",
        regexp_extract(col("cu"), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1))
      .withColumn("stem", regexp_extract(col("cu"), "^([^?]*)", 1))
      .withColumn("params",
        filter(split(regexp_extract(col("cu"), "\\?(.*)$", 1), "&"),
          p => p =!= ""))
    val exploded = base
      .select(col("host"), col("stem"), col("params"), col("h"),
        explode(col("params")).as("kv"))
      .withColumn("k", regexp_extract(col("kv"), "^([^=]*)", 1))
      .withColumn("v", regexp_extract(col("kv"), "^[^=]*=(.*)$", 1))
      // context = the URL with THIS param removed (exact key match,
      // not prefix — `s` must not strip `sess`)
      .withColumn("ctx", concat(col("stem"), lit("?"), array_join(
        filter(col("params"),
          p => element_at(split(p, "="), 1) =!= col("k")), "&")))
    val perCtx = exploded.groupBy("host", "k", "ctx")
      .agg(countDistinct(col("v")).as("nv"),
        countDistinct(col("h")).as("nh"))
    perCtx.groupBy(col("host"), col("k").as("param"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("nv") >= 2, 1L).otherwise(0L))
          .as("n_multi_value_groups"),
        sum(when(col("nv") >= 2 && col("nh") >= 2, 1L).otherwise(0L))
          .as("n_varying_groups"))
      .withColumn("irrelevant", col("n_multi_value_groups") >= 1L &&
        col("n_varying_groups") === 0L)
      .orderBy("host", "param")
  }

  /** Gate a URL table on parsed robots rules ([[parseRobots]] output)
    * for one crawler `agent`, with RFC 9309 precedence: the
    * applicable group per host is the agent's own if the file names
    * it anywhere, else the `*` group; among applicable rules whose
    * pattern matches the start of the `path?query` match target the
    * LONGEST pattern wins, ties prefer `allow`; no matching rule — or
    * no robots.txt for the host at all — means allowed. Returns
    * `(id, host, target, allowed, win_len)` with `win_len` the
    * winning pattern's length (null when no rule matched).
    *
    * Scale shape: rules collapse to ONE array row per host (a
    * planning table) joined broadcast into the URL scan; the match +
    * longest-wins fold is a per-row array program — the 100 TB URL
    * side never shuffles and never joins row-per-rule. Pass
    * `hintBroadcast = false` when the host universe is too large to
    * broadcast and let AQE pick the join.
    */
  def robotsGate(urls: DataFrame, rules: DataFrame, agent: String = "*",
      urlCol: String = "url", idCol: String = "id",
      hintBroadcast: Boolean = true,
      maxRulesPerHost: Int = 1000): DataFrame =
    robotsVerdicts(urls, rules, agent, urlCol, idCol, hintBroadcast,
        maxRulesPerHost = maxRulesPerHost)
      .orderBy("id")

  /** [[robotsGate]] without the output sort — the form a streaming
    * caller composes (sorting is illegal mid-stream; the batch gate
    * adds `orderBy(id)` on top). The rules side is always static, so
    * its window/groupBy prep is legal under a stream-static join.
    * `keep` names extra `urls` columns carried through to the output
    * (a downstream dedup wants the canonical key without re-joining
    * the verdicts back by id).
    */
  private[graft] def robotsVerdicts(urls: DataFrame, rules: DataFrame,
      agent: String, urlCol: String, idCol: String,
      hintBroadcast: Boolean, keep: Seq[String] = Nil,
      maxRulesPerHost: Int = 1000): DataFrame = {
    require(maxRulesPerHost >= 1,
      s"maxRulesPerHost must be positive, got $maxRulesPerHost")
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val scoped = rules.where(col("agent").isin(a, "*"))
      .withColumn("is_spec", (col("agent") === a).cast("int"))
    val wh = Window.partitionBy("host")
    // Per-host rule CAP: the match fold below runs every rule's regex
    // per URL, so a pathological 10⁴-rule robots.txt would cost
    // O(10⁴) interpreted regexes PER URL. Cap by precedence — sort
    // the collapsed rule array by (pattern_len, allow) and keep the
    // TOP maxRulesPerHost after reversal, i.e. the longest patterns
    // (allow preferred on ties), which are exactly the rules that
    // would win longest-match precedence. A file at or under the cap
    // (every real robots.txt — the RFC's 500 KiB body cap bounds rule
    // count three orders of magnitude below 10⁴ typical) is untouched:
    // the slice is a no-op when the array is shorter than the cap.
    // Beyond it, the LOWEST-precedence (shortest) patterns drop — the
    // documented degradation for adversarial files.
    val perHost = scoped
      .withColumn("has_spec", max(col("is_spec")).over(wh))
      .where(col("is_spec") === col("has_spec"))
      .groupBy("host")
      .agg(slice(reverse(array_sort(
        collect_list(struct(col("pattern_len").as("len"),
          (col("rule") === "allow").cast("int").as("al"),
          col("pattern_re").as("re"))))), 1, maxRulesPerHost).as("rs"))
    val hinted = if (hintBroadcast) broadcast(perHost) else perHost
    val u = urls.select(col(idCol).cast("long").as("id") +:
        regexp_extract(col(urlCol), "^([^#]*)", 1).as("u0") +:
        keep.map(col): _*)
      .withColumn("host", lower(regexp_extract(col("u0"),
        "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)))
      .withColumn("t0", regexp_extract(col("u0"),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1))
      .withColumn("target",
        when(col("t0") === "", lit("/")).otherwise(col("t0")))
    u.join(hinted, Seq("host"), "left")
      // longest-match-wins as one array fold: non-matching rules map
      // to null, array_max's lexicographic struct ordering does the
      // (length, allow-beats-disallow) precedence
      .withColumn("best", array_max(filter(
        transform(col("rs"), r =>
          when(regexp_like(col("target"), r("re")),
            struct(r("len"), r("al")))),
        x => x.isNotNull)))
      .select(col("id") +: col("host") +: col("target") +:
        coalesce(col("best")("al") === 1, lit(true)).as("allowed") +:
        col("best")("len").as("win_len") +: keep.map(col): _*)
  }

  /** Deterministic weight-sensitive sampling without replacement —
    * priority sampling (Duffield–Lund–Thorup 2007): each item draws
    * `u = (mix31(id)+1) / 2³¹ ∈ (0,1]` and gets priority `w / u`; the
    * sample is the k highest-priority items per stratum, the
    * threshold `tau` is the (k+1)-th priority (0 when the stratum has
    * ≤ k items), and `adj_weight = max(w, tau)` is the
    * Horvitz–Thompson estimator weight — summing `adj_weight` over
    * the sample estimates the stratum's true weight total, the whole
    * point of weight-sensitive sampling. mix31 is a 31-bit bijection,
    * so the draw is a pure function of the ids, reproducible on any
    * engine (the oracle restates it exactly: the priority is ONE
    * IEEE multiply and ONE divide of exact integers, bit-identical in
    * both engines).
    *
    * Scale shape: priorities are map-only; per-stratum selection is
    * the bounded-heap `topk_rows` aggregate at k+1 (partial
    * aggregation caps the shuffle at k+1 rows per stratum per task —
    * never a per-stratum sort); tau rides the same aggregate as the
    * heap's last element.
    */
  def prioritySample(docs: DataFrame, k: Int = 10,
      labelCol: String = "source", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val t = docs
      .where(col(labelCol).isNotNull && col(textCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(labelCol).as("label"),
        col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("weight"))
      .withColumn("h", Similarity.mix31Col(col("doc_id")))
      .withColumn("priority", col("weight").cast("double") *
        2147483648.0 / (col("h") + 1L).cast("double"))
    t.groupBy("label")
      .agg(call_function("topk_rows",
        struct((-col("priority")).as("np"), col("doc_id"), col("weight")),
        lit(k + 1)).as("top"))
      .select(col("label"),
        when(size(col("top")) === k + 1,
          -element_at(col("top"), k + 1)("np")).otherwise(0.0).as("tau"),
        posexplode(slice(col("top"), 1, k)).as(Seq("i", "r")))
      .select(col("label"), (col("i") + 1).cast("int").as("rank"),
        col("r")("doc_id").as("doc_id"), col("r")("weight").as("weight"),
        (-col("r")("np")).as("priority"), col("tau"),
        greatest(col("r")("weight").cast("double"), col("tau"))
          .as("adj_weight"))
      .orderBy("label", "rank")
  }

  /** Sliding-window token chunking with overlap — the LM-eval /
    * RAG-retrieval chunker: windows of `width` tokens start every
    * `stride` tokens (`stride < width` ⇒ consecutive windows overlap
    * by `width − stride`), the last window keeps its remainder, and a
    * doc of ≤ `width` tokens is one window. The fixed-width
    * [[chunkTokens]] is the `stride = width` special case. Emits
    * `(doc_id, win_idx, start_tok, n_tokens, chunk)`.
    *
    * Map-only like [[chunkTokens]]: the fan-out is an in-plan
    * transform+explode — no shuffle, no state, rides the scan.
    */
  def chunkWindows(docs: DataFrame, width: Int = 32, stride: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    chunkWindowsUnsorted(docs, width, stride, textCol, idCol)
      .orderBy("doc_id", "win_idx")

  /** [[chunkWindows]] without the presentation sort — being a pure
    * map-only column program, this form runs UNCHANGED on a streaming
    * DataFrame (no state, no watermark; q401 pins the equivalence).
    */
  def chunkWindowsUnsorted(docs: DataFrame, width: Int = 32,
      stride: Int = 16, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(width >= 1, s"width must be positive, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width], got $stride")
    val ws = split(col(textCol), " ")
    val n = size(ws)
    // exact: n ≤ 2^31 tokens, the double ceil can't misround (the
    // ppmFloor argument); DuckDB's CEIL matches bit for bit
    val nw = when(n <= width, lit(1)).otherwise(
      ceil((n - width).cast("double") / stride).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), ws.as("ws"), nw.as("nw"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nw") - 1),
          i => slice(col("ws"), i * stride + 1, lit(width))))
          .as(Seq("win_idx", "cw")))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx").cast("long") * stride).as("start_tok"),
        size(col("cw")).cast("long").as("n_tokens"),
        concat_ws(" ", col("cw")).as("chunk"))
  }

  def dsirSelect(corpus: DataFrame, target: DataFrame,
      buckets: Int = 1024, topN: Int = 100,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    require(topN >= 1, s"topN must be positive, got $topN")
    // counts + scoring both read the profile: materialize it once
    val prof = dsirProfile(corpus, buckets, textCol, idCol)
      .localCheckpoint()
    val lam = dsirWeightsFrom(prof, target, buckets, textCol, idCol)
    prof.join(broadcast(lam), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("c") * col("lam")).as("sm"),
        sum(col("c")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("sm div n_tokens").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }
}

/** Executor-side implementation of [[Curation.idnAsciiUrl]]. Top-level
  * and Serializable so the UDF closure captures only this module
  * (never `Curation$` — the JsonSizeFn Task-not-serializable lesson),
  * and the URL-shape pattern compiles once per JVM, not per row.
  */
private[ops] object IdnFn extends Serializable {
  private val urlShape = java.util.regex.Pattern
    .compile("^([A-Za-z][A-Za-z0-9+.-]*://)([^/?#]+)(.*)$",
      java.util.regex.Pattern.DOTALL)

  def asciiUrl(u: String): String =
    if (u == null) null
    else {
      val m = urlShape.matcher(u)
      if (!m.matches()) u
      else {
        val auth = m.group(2)
        // split host from userinfo/port so only the host encodes
        val at = auth.lastIndexOf('@')
        val (userinfo, hostPort) =
          if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1))
          else ("", auth)
        val colon = hostPort.indexOf(':')
        val (host, port) =
          if (colon >= 0) (hostPort.substring(0, colon),
            hostPort.substring(colon))
          else (hostPort, "")
        val ascii = scala.util.Try(java.net.IDN.toASCII(host))
          .getOrElse(host)
        m.group(1) + userinfo + ascii + port + m.group(3)
      }
    }
}

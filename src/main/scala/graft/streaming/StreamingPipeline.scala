package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming front door for the training-data pipeline ops: the batch
  * operators in [[graft.ops.DocDedup]] assume a materialized corpus;
  * these are their ingest-time twins over an unbounded document
  * stream.
  *
  * Scale stance (100 TB/day ingest):
  *   - exact dedup keys state by a 16-byte content hash, never the
  *     document, and `dropDuplicatesWithinWatermark` evicts state as
  *     the watermark passes — state is O(unique docs per watermark
  *     window), not O(stream).
  *   - fingerprint tagging (simhash / minhash signature) is stateless
  *     map-only via the native codegen'd kernels, so it runs at full
  *     ingest parallelism with zero shuffle; downstream batch LSH
  *     banding consumes the persisted signatures without re-reading
  *     text.
  */
object StreamingPipeline {

  /** The uniform bounded-state knob of every keyed stream here:
    * `None` → `NoTimeout` (state lives forever — honest when the
    * semantics are "ever seen" / "all history"), `Some(duration)` →
    * `ProcessingTimeTimeout`, re-armed per key after each update, so
    * a key idle past the TTL drops its state (eviction as a retention
    * policy). Each op's kernel handles `state.hasTimedOut` by
    * removing and emitting nothing.
    */
  private def ttlTimeout(stateTtl: Option[String])
      : org.apache.spark.sql.streaming.GroupStateTimeout =
    if (stateTtl.isDefined)
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout
    else org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout

  /** Exact-dup suppression on a document stream: first arrival of each
    * content hash within the watermark horizon passes through,
    * duplicates are dropped. The hash column is added (and kept) so
    * the sink can audit what keyed the state. Composes behind other
    * watermarked stages ([[urlGateStream]] → content dedup, the
    * two-stage crawl front): an input that already carries an
    * event-time watermark keeps it — re-stamping one downstream of a
    * stateful operator is an analysis error on Spark 4.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", delay: String = "10 minutes"): DataFrame = {
    val hashed = docs.withColumn("text_hash", md5(col(textCol)))
    val hasWatermark = docs.queryExecution.analyzed.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }.isDefined
    (if (hasWatermark) hashed else hashed.withWatermark(tsCol, delay))
      .dropDuplicatesWithinWatermark("text_hash")
  }

  /** Crawl front gate on a URL stream: canonicalize
    * ([[graft.ops.Curation.canonicalUrl]] — the SAME column program
    * the batch dedup keys on, so live gate and batch backfill agree
    * byte for byte), drop blocked domains (exact host or any
    * subdomain), then suppress canonical-key duplicates within the
    * watermark horizon. First arrival per canonical key passes.
    *
    * Convenience overload: a literal domain list. Builds a one-column
    * blocklist frame and delegates — the join-based gate, never a
    * folded predicate chain (a 10⁶-domain list as per-row predicates
    * would be O(|blocklist|) per row AND recompile the plan on every
    * list change).
    */
  def urlGateStream(docs: DataFrame, blockedDomains: Seq[String] = Nil,
      urlCol: String = "url", tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    urlGateStream(docs, blockedDomains.toDF("domain"), urlCol, tsCol, delay)
  }

  /** Blocklist-as-data form of the crawl front gate. `blocklist` is a
    * DataFrame with a `domain` column (lowercased on entry); a URL is
    * dropped when its host IS a listed domain or is a subdomain of
    * one.
    *
    * Scale shape: subdomain matching is [[graft.ops.Curation
    * .blocklistGate]] — one stream-static broadcast LEFT ANTI join
    * per label depth, keyed `last-k-labels(host) = domain`, per-row
    * cost O(#depths) hash probes independent of blocklist size.
    * Updating the list is a data swap, not a plan recompile, WITH the
    * caveat that the depth set is fixed at stream start: this gate
    * probes the FIXED range 1..8 (not the current list's depths), so
    * a swapped-in list whose first 7-label domain appears mid-stream
    * is still gated — only a >8-label domain (no real blocklist has
    * one) would wait for a query rebuild. Dedup state keys by the
    * 16-byte `url_key = md5(canonical)` (never the URL string) and
    * the watermark evicts it — state is O(unique URLs per horizon),
    * not O(stream).
    */
  def urlGateStream(docs: DataFrame, blocklist: DataFrame,
      urlCol: String, tsCol: String, delay: String): DataFrame = {
    val canon = docs.where(col(urlCol).isNotNull)
      .withColumn("canonical_url",
        graft.ops.Curation.canonicalUrl(col(urlCol)))
    val host = regexp_extract(col("canonical_url"),
      "^[a-z][a-z0-9+.-]*://([^/?#:]+)", 1)
    val gated = graft.ops.Curation.blocklistGate(
      canon, blocklist, host, depths = 1 to 8)
    gated
      .withColumn("url_key", md5(col("canonical_url")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("url_key")
  }

  /** Robots.txt politeness gate on a URL stream — the RFC 9309 twin
    * of [[graft.ops.Curation.robotsGate]], sharing its verdict core
    * verbatim (parse with [[graft.ops.Curation.parseRobots]] on the
    * static side): URLs whose `path?query` target a matching rule
    * disallows are dropped, everything else passes with the winning
    * pattern length attached. Stateless map-only — the rules collapse
    * to one array row per host on the STATIC side and broadcast into
    * the stream, so the gate adds no state, no watermark, no shuffle;
    * it composes in front of [[urlGateStream]] (blocklist + dedup)
    * as the crawl front's first hop.
    */
  def robotsGateStream(urls: DataFrame, rules: DataFrame,
      agent: String = "*", urlCol: String = "url",
      idCol: String = "id", keep: Seq[String] = Nil): DataFrame =
    graft.ops.Curation
      .robotsVerdicts(urls, rules, agent, urlCol, idCol,
        hintBroadcast = true, keep = keep)
      .where(col("allowed"))
      .select(("id" +: "host" +: "target" +: "win_len" +: keep)
        .map(col): _*)

  /** Streaming crawler-trap monitor — the live twin of
    * [[graft.ops.Curation.crawlerTraps]], sharing its template
    * projection verbatim (`Curation.templated`): URLs lift to path
    * templates as they arrive, first arrival per canonical key passes
    * a dedup, and a running distinct-URL count per template emits
    * every micro-batch (Update mode — the latest emission per
    * template is the current count; counts only grow, so a sink
    * keeps the max). This chains a SECOND multiple-stateful-operator
    * shape (dropDuplicatesWithinWatermark → streaming aggregation;
    * q403's loop pinned dedup → flatMapGroupsWithState).
    *
    * Scale shape: templating map-only in the source scan; dedup state
    * keys the 16-byte md5 of the canonical URL and the watermark
    * evicts it; aggregation state is one counter per template —
    * bounded by template cardinality, which is the whole point of
    * templates. Exact-count contract matches the batch op whenever a
    * URL's duplicates arrive within the watermark horizon (the q54
    * replay discipline); beyond it a refetched URL recounts.
    */
  def crawlerTrapsStream(urls: DataFrame, minUrls: Long = 100L,
      urlCol: String = "url", tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame = {
    require(minUrls >= 1L, s"minUrls must be positive, got $minUrls")
    graft.ops.Curation
      .templated(urls.where(col(urlCol).isNotNull), urlCol,
        keep = Seq(tsCol))
      .withColumn("url_key", md5(col("cu")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("url_key")
      .groupBy("template", "depth")
      .agg(count(lit(1)).as("n_urls"))
      .withColumn("is_trap", col("n_urls") >= minUrls)
  }

  /** Stream → lake: land events hive-partitioned by UTC hour, the
    * write side of the reference's firehose→Athena layout
    * (startup.sh) on the live path. The layout prep is
    * [[graft.sources.Lake.partitionedByHour]] — the SAME code the
    * batch writer uses — so the batch alert engine's 2-hour window
    * prunes streamed data identically and null-ts rows drop the same
    * way (dead-letter parity).
    *
    * Small-file note: each microbatch writes one file per in-batch
    * hour per writing task, so micro-batch cadence is the file-count
    * knob — pass a `Trigger.ProcessingTime` sized so one batch holds
    * minutes of data (or `Trigger.AvailableNow` for a drain). Do NOT
    * rewrite this directory with batch `Lake.write`: the streaming
    * sink's `_spark_metadata` log is the source of truth for readers,
    * and out-of-band rewrites orphan or hide files; compaction of a
    * streamed lake means draining it into a NEW directory.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def toLake(events: DataFrame, dir: String, checkpointDir: String,
      tsCol: String = "ts",
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = graft.sources.Lake.partitionedByHour(events, tsCol)
      .writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(graft.sources.Lake.partitionCols: _*)
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Stream-static corpus filter (exact): drop stream documents whose
    * content hash already exists in a persisted
    * [[graft.ops.DocDedup.signatures]] snapshot — the live front gate
    * of the incremental-dedup serving path (q47/q57): the firehose
    * never lands a byte-identical copy of corpus content. Stateless
    * (each micro-batch anti-joins the static side) — no watermark, no
    * state store, and the stream side ships only (row, 16-byte hash)
    * through the join.
    */
  def corpusFilterStream(docs: DataFrame, corpusSigs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.withColumn("text_hash", md5(col(textCol)))
      .join(corpusSigs.select(col("text_hash")).dropDuplicates("text_hash"),
        Seq("text_hash"), "left_anti")

  /** Streaming benchmark-decontamination gate: flag each arriving
    * corpus document that shares ≥ `minHits` distinct word n-grams
    * with a static eval set — [[graft.ops.Curation.decontaminate]]'s
    * exact-overlap contract as a crawl-time filter. Output per
    * flagged doc: `(doc_id, hit_shingles, eval_hit)` (distinct shared
    * grams, earliest matching eval id) — the batch op's schema with
    * gram STRINGS in place of shingle hashes (identical counts absent
    * collisions, the q21/q22 contract).
    *
    * Scale shape: the eval set is benchmark-sized BY CONTRACT, so its
    * gram → earliest-id table ships to every executor ONCE as a
    * `SparkContext.broadcast` java HashMap and the stream side probes
    * it O(1) per gram inside one UDF pass — the streaming analogue of
    * the batch broadcast hash join. Fully map-only: no join, no
    * shuffle, no state, no watermark, safe in any output mode. (The
    * r7 version embedded the table as a `typedLit` plan literal;
    * literal `MapData` has NO hash index — `element_at` is a linear
    * scan — so the "map-only" plan was secretly
    * O(corpus-grams × eval-grams), 84× slower than its Bloom twin.
    * The broadcast HashMap keeps the same no-join shape with real
    * O(1) probes, and the plan no longer carries megabytes of
    * literal.) The one-time static-side aggregation that builds the
    * table is a bounded driver pull, same class as the audited
    * query-vector collects.
    */
  def decontaminateStream(docs: DataFrame, evalSet: DataFrame,
      n: Int = 3, minHits: Long = 1L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def grams(c: Column): Column = {
      val t = split(c, " ")
      array_distinct(when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          p => array_join(slice(t, p + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
    }
    val lookup = new java.util.HashMap[String, java.lang.Long]()
    evalSet
      .where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("eval_id"),
        explode(grams(col(textCol))).as("gram"))
      .groupBy("gram").agg(min("eval_id").as("eval_id"))
      .collect().foreach(r => lookup.put(r.getString(0), r.getLong(1)))
    val bc = docs.sparkSession.sparkContext.broadcast(lookup)
    // fused kernel: grams are generated AND probed in one JVM pass
    // over the raw text (no array<string> column materialized, no
    // Catalyst↔Scala array conversion); only HITS pay a set insert,
    // so the distinct-gram contract costs O(hits), not O(grams)
    val nn = n
    val probe = udf((text: String) => {
      val m = bc.value
      // limit -1: keep trailing empty tokens — Spark's split() (which
      // built the eval-side grams) and DuckDB's string_split both do,
      // and a trailing-space doc must gram identically on both sides
      val ws = text.split(" ", -1)
      if (ws.length < nn) None
      else {
        var minEval = Long.MaxValue
        val hitGrams = new java.util.HashSet[String]()
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i + nn <= ws.length) {
          sb.setLength(0)
          var j = 0
          while (j < nn) {
            if (j > 0) sb.append(' ')
            sb.append(ws(i + j)); j += 1
          }
          val g = sb.toString
          val v = m.get(g)
          if (v != null && hitGrams.add(g) && v < minEval) minEval = v
          i += 1
        }
        if (hitGrams.isEmpty) None
        else Some((hitGrams.size.toLong, minEval))
      }
    })
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        probe(col(textCol)).as("p"))
      .where(col("p").isNotNull && col("p._1") >= minHits)
      .select(col("doc_id"), col("p._1").as("hit_shingles"),
        col("p._2").as("eval_hit"))
  }

  /** DSIR gate on a document stream: score each arriving doc against
    * a PRE-COMPUTED hashed-importance weight table
    * ([[graft.ops.Curation.dsirWeights]] — the batch artifact) and
    * pass docs whose floor-mean token weight is at-or-above
    * `minScore` — "train the sampler offline, run it on the crawl",
    * the same serving shape as the persisted IVF index. The weight
    * table is exactly `buckets` rows BY CONTRACT, so it collects to a
    * primitive long[] and ships once as a SparkContext.broadcast; the
    * stream side is one fused JVM pass per doc (split, base-37 word
    * hash, array probe, integer fold — the q385 arithmetic bit for
    * bit, empty tokens skipped exactly like the batch filter).
    * Map-only: no join, no state, no watermark.
    */
  def dsirGateStream(docs: DataFrame, weights: DataFrame, minScore: Long,
      buckets: Int = 1024, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val lam = new Array[Long](buckets)
    weights.select(col("bucket"), col("lam")) // bounded: `buckets` rows
      .collect()
      .foreach(r => lam(r.getLong(0).toInt) = r.getLong(1))
    val bc = docs.sparkSession.sparkContext.broadcast(lam)
    val score = udf((text: String) => {
      val l = bc.value
      var i = 0; var n = 0L; var sm = 0L
      val len = text.length
      while (i <= len) {
        var j = i; var h = 0L; var any = false
        // Iterate CODE POINTS, not UTF-16 units: the batch kernel's
        // split(w, '') + ascii(c) hashes one full code point per
        // step (Java regex split is code-point aware), so a
        // surrogate pair (emoji, rare CJK) must fold as one value
        // here too or the doc buckets differently than the weight
        // table that scores it.
        while (j < len && text.charAt(j) != ' ') {
          val cp = text.codePointAt(j)
          h = (h * 37 + cp) % 2147483647L
          any = true; j += Character.charCount(cp)
        }
        if (any) { n += 1L; sm += l((h % l.length).toInt) }
        i = j + 1
      }
      if (n == 0L) None else Some((n, Math.floorDiv(sm, n)))
    })
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        score(col(textCol)).as("s"))
      .where(col("s").isNotNull && col("s._2") >= minScore)
      .select(col("doc_id"), col("s._1").as("n_tokens"),
        col("s._2").as("score"))
  }

  /** Streaming Gopher quality gate: the q366 rule bundle
    * ([[graft.ops.TextAnalysis.gopherRulesUnsorted]]) applied at
    * crawl time. Pure per-row projection — no join, no state, no
    * watermark, legal in any output mode — emitting the same
    * per-rule verdicts and drop-reason bitmask as the batch op, so a
    * curation pipeline can explain every drop live. `keepOnly = true`
    * turns the report into a filter (the gate proper).
    */
  def gopherGateStream(docs: DataFrame, minStopHits: Long = 2L,
      keepOnly: Boolean = false): DataFrame = {
    val scored = graft.ops.TextAnalysis.gopherRulesUnsorted(
      docs, minStopHits = minStopHits)
    if (keepOnly) scored.where(col("keep")) else scored
  }

  /** Stream-static near-dup alarm: MinHash band join of the live
    * stream against the persisted corpus signature snapshot, verified
    * IN-STREAM by exact Jaccard over the shingle-hash sets both sides
    * already carry. Emits one row per matching band —
    * `(doc_id, c_id, band, jac_micro ≥ threshold·10⁶)` — alarm
    * events, not a deduped pair list: distinct-ing across bands would
    * cost a streaming aggregation (state store + watermark) for no
    * serving value, so a pair agreeing on two bands fires twice.
    *
    * Scale shape: the stream side is map-only (one `minhash_state`
    * kernel call per row) up to ONE stream-static equi-join keyed by
    * `(band, bandhash)`; short docs (empty shingle set) drop on both
    * sides — the stored-sentinel cross-join hazard
    * [[fingerprintStream]] documents. Banding layout is
    * [[graft.ops.DocDedup.bandKeys]], the same definition the batch
    * LSH uses — snapshot and stream MUST share `n`/`numHashes`/`bands`
    * (the [[graft.ops.DocDedup.incrementalFromSignatures]] contract).
    */
  def nearDupAlarmStream(docs: DataFrame, corpusSigs: DataFrame,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val rows = numHashes / bands
    // same startup guard as the batch serving path — the static side
    // is a batch DataFrame, so the one-row probe is legal here too
    graft.ops.DocDedup.requireSignatureWidth(corpusSigs, numHashes,
      "this stream")
    val mh = call_function("minhash_state",
      split(col(textCol), " "), lit(n), lit(numHashes))
    val f = docs.select(col(idCol).as("doc_id"), mh.as("mh"))
      .select(col("doc_id"), col("mh.sh").as("sh"), col("mh.sig").as("sig"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        explode(graft.ops.DocDedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    val c = corpusSigs.where(size(col("sh")) > 0)
      .select(col("doc_id").as("c_id"), col("sh").as("c_sh"),
        explode(graft.ops.DocDedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("c_id"), col("c_sh"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    // sh is sorted-distinct (kernel contract): two-pointer count
    val inter = call_function("sorted_intersect_count", col("sh"), col("c_sh"))
    val uni = size(col("sh")) + size(col("c_sh")) - inter
    // floor(inter·10⁶/uni) ≥ thr·10⁶ ⟺ inter/uni ≥ thr exactly (both
    // rationals over the same small denominator) — the stream applies
    // the IDENTICAL threshold contract as the batch verify
    f.join(c, Seq("band", "bh"))
      .withColumn("jac_micro",
        floor(inter.cast("double") * 1e6 / uni).cast("long"))
      .where(col("jac_micro") >= math.floor(threshold * 1e6).toLong)
      .select("doc_id", "c_id", "band", "jac_micro")
  }

  /** Per-band-bucket dedup state: the FIRST document seen in this
    * (band, bandhash) bucket — id plus its shingle-hash set for the
    * in-stream exact-Jaccard verify.
    */
  /** Per-bucket state: the first occupant's id plus its SORTED
    * shingle-hash array (primitive encoding — the lightest exact
    * representation; sorting makes the verify a linear merge).
    */
  case class BandRep(repId: Long, sh: Array[Long])

  case class SelfDupRow(doc_id: Long, c_id: Long, band: Int,
    jac_micro: Long)

  /** SELF-referential streaming near-dup: every arriving document is
    * LSH-banded ([[graft.ops.DocDedup.bandKeys]], the batch layout)
    * and compared against the EARLIEST document that ever occupied
    * each of its band buckets — [[nearDupAlarmStream]] dedups a
    * stream against a static snapshot; this op dedups the stream
    * against itself, the shape an always-on crawl ingest needs.
    * Emits one row per (doc, band) whose exact Jaccard against the
    * bucket representative reaches `threshold` — alarm events like
    * the static twin, not a distinct pair list.
    *
    * Determinism contract: within a micro-batch each bucket's
    * arrivals are processed in doc-id order (the per-key batch is
    * buffered and sorted), so a single-batch drain reproduces the
    * batch semantics exactly: representative = min doc id per
    * bucket. Across batches "earliest" means earliest BATCH first —
    * arrival order, the honest streaming answer.
    *
    * Scale shape: map-only signature + banding up to one shuffle
    * keyed by (band, bandhash); state is ONE `(id, sorted
    * shingle-hash array)` per occupied bucket — proportional to the
    * corpus' bucket count, the same size class as the batch LSH's
    * band table. Eviction contract: with the default `stateTtl =
    * None` the representative lives forever (self-dedup against
    * unbounded history — the honest price of "ever seen before");
    * passing a TTL (e.g. `"6 hours"`) arms a processing-time timeout
    * per bucket so the dedup horizon becomes a retention policy: a
    * bucket idle past the TTL drops its representative and the next
    * arrival becomes the new first occupant. State growth is spec-
    * pinned (StreamingSpec "selfDedupStream state is one row per
    * occupied bucket"): re-sending the same corpus adds ZERO rows.
    *
    * State-format note (round 8): `BandRep.sh` changed from
    * `Seq[Long]` to a SORTED `Array[Long]` — a different state
    * encoding. A query restored from a pre-change checkpoint will
    * misread its state; restart from a fresh checkpoint. New
    * deployments are unaffected.
    */
  def selfDedupStream(docs: DataFrame, n: Int = 3, numHashes: Int = 16,
      bands: Int = 4, threshold: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id", stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[SelfDupRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val rows = numHashes / bands
    val thrMicro = math.floor(threshold * 1e6).toLong
    val spark = docs.sparkSession
    import spark.implicits._
    val mh = call_function("minhash_state",
      split(col(textCol), " "), lit(n), lit(numHashes))
    val timeoutConf = ttlTimeout(stateTtl)
    docs
      .select(col(idCol).cast("long").as("doc_id"), mh.as("mh"))
      .select(col("doc_id"), col("mh.sh").as("sh"), col("mh.sig").as("sig"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        explode(graft.ops.DocDedup.bandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("sh"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
      .as[(Long, Seq[Long], Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: (Int, Long), it: Iterator[(Long, Seq[Long], Int, Long)],
         state: GroupState[BandRep]) => {
          if (state.hasTimedOut) {
            // TTL horizon passed with no arrivals: forget the bucket
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toIndexedSeq.sortBy(_._1)
            var st = state.getOption
            val out = Seq.newBuilder[SelfDupRow]
            sorted.foreach { case (id, sh, band, _) =>
              st match {
                case None => st = Some(BandRep(id, sh.toArray.sorted))
                case Some(rep) =>
                  // exact |A∩B| by sorted-merge against the stored
                  // sorted array (shingle hashes are distinct per doc)
                  val a = sh.toArray.sorted
                  val b = rep.sh
                  var i = 0; var j = 0; var inter = 0L
                  while (i < a.length && j < b.length) {
                    if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
                    else if (a(i) < b(j)) i += 1
                    else j += 1
                  }
                  val uni = a.length.toLong + b.length - inter
                  // floor(inter·10⁶/uni): exact in double at these
                  // sizes, the same contract as the static alarm
                  val jac = math.floor(inter.toDouble * 1e6 / uni).toLong
                  if (jac >= thrMicro) out += SelfDupRow(id, rep.repId, band, jac)
              }
            }
            st.foreach { s =>
              state.update(s)
              stateTtl.foreach(state.setTimeoutDuration)
            }
            out.result().iterator
          }
        })
  }

  /** Stateless in-stream fingerprinting: attach simhash + MinHash
    * signature per document via the native kernels (pure projection —
    * safe in any output mode, no state, no watermark needed).
    */
  def fingerprintStream(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 16): DataFrame = {
    val words: Column = split(col(textCol), " ")
    val mh = call_function("minhash_state", words, lit(shingleN), lit(numHashes))
    docs
      .withColumn("simhash", call_function("simhash64", words))
      // docs shorter than shingleN words have no signature: persist
      // NULL, not the empty-set sentinel — a stored sentinel would
      // band-match every other short doc when batch LSH consumes the
      // signature table
      .withColumn("minhash_sig",
        when(size(mh.getField("sh")) > 0, mh.getField("sig")))
  }

  /** Per-key integer EWMA state (`acc := (acc >> 1) + value_micro`)
    * carried by `EwmaState`. */
  case class EwmaState(n: Long, acc: Long)
  case class EwmaRow(user_id: Long, n_events: Long, ewma_micro: Long)

  /** Streaming twin of [[graft.ops.Temporal.ewmaMicro]]: the decayed
    * feature state folds live in `flatMapGroupsWithState`, emitting
    * each key's updated `(n, ewma)` per micro-batch — the serving
    * counterpart of the batch backfill, and because the fold is the
    * SAME integer arithmetic, serving state == backfill state bit for
    * bit.
    *
    * Ordering contract: events sort by (ts, tie) WITHIN a micro-batch
    * before folding; cross-batch order is arrival order. Exact batch
    * parity therefore holds when each key's history arrives in one
    * batch (the replay/drain case, like q54's DISTINCT equivalence)
    * or when batches are event-time aligned — the usual property of a
    * replayed log. State is two longs per key; with the default
    * `stateTtl = None` it lives forever, and per-user keys on a
    * crawl-scale stream grow without bound — pass a TTL (e.g.
    * `"7 days"`) to arm a processing-time timeout per key: a key idle
    * past the TTL drops its state and a later event restarts its fold
    * from zero (a retention policy, the bounded-state contract every
    * keyed stream here shares).
    */
  def ewmaStream(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      tieCol: String = "event_id", stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[EwmaRow] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"), unix_micros(col(tsCol)).as("us"),
        col(tieCol).cast("long").as("tie"),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtl))(
        (key: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[EwmaState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3))
            val st = sorted.foldLeft(state.getOption.getOrElse(EwmaState(0L, 0L))) {
              case (s, (_, _, _, vm)) => EwmaState(s.n + 1, (s.acc >> 1) + vm)
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single(EwmaRow(key, st.n, st.acc))
          }
        })
  }

  /** Token-bucket state: credit in µs-of-refill + last event's µs
    * (−1 = none yet) — two longs per key, the O(1) state the batch
    * fold's collect_list can't offer on an unbounded stream.
    */
  case class BucketState(tokUs: Long, prevUs: Long)
  case class ThrottleRow(user_id: Long, event_id: Long, allowed: Boolean,
      avail_us: Long)

  /** Streaming twin of [[graft.ops.Temporal.tokenBucket]]: per-key
    * burst-of-capacity / sustained-1-per-refill throttling with the
    * identical division-free µs-credit recurrence, as
    * flatMapGroupsWithState keyed state. Each micro-batch sorts its
    * per-key rows by (event time, id) and folds them through the
    * bucket; the carried state is two longs, so key cardinality —
    * not stream length — bounds the store.
    *
    * Ordering contract (same as ewmaStream): deterministic given the
    * batch boundaries; events arriving in a LATER micro-batch with an
    * EARLIER timestamp are folded when they arrive (their delta is
    * clamped at 0, never negative credit). Replayed in one batch the
    * output equals the batch fold bit for bit — that equivalence is
    * the oracle gate (q251 vs q250's recursive-CTE oracle).
    */
  def tokenBucketStream(events: DataFrame, capacity: Int = 3,
      refillUs: Long = 86400000000L, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[ThrottleRow] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val capUs = capacity * refillUs
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol).cast("long").as("k"),
        unix_micros(col(tsCol)).as("us"), col(idCol).cast("long").as("id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (key: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[BucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toIndexedSeq.sortBy(r => (r._2, r._3))
            var st = state.getOption.getOrElse(BucketState(capUs, -1L))
            val out = sorted.map { case (_, us, id) =>
              val delta = if (st.prevUs < 0) 0L else math.max(0L, us - st.prevUs)
              val avail = math.min(capUs, st.tokUs + delta)
              val allowed = avail >= refillUs
              st = BucketState(avail - (if (allowed) refillUs else 0L),
                math.max(st.prevUs, us))
              ThrottleRow(key, id, allowed, avail)
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  /** Per-bucket Misra-Gries sketch state. `counts` is the bounded
    * counter map (≤ k entries), `processed` the bucket's total row
    * count — the guarantee check needs N = Σ processed.
    */
  case class RecrawlState(firstUs: Long, lastUs: Long, lastH: String,
    n: Long, chg: Long, upd: Long)

  case class RecrawlRow(u: Long, n_fetches: Long, n_changes: Long,
    span_sec: Long, last_sec: Long, upd: Long)

  /** Streaming twin of [[graft.ops.Curation.recrawlPriority]]'s stats
    * half: per-URL fetch count, content-hash flip count, and observed
    * span maintained as O(1) keyed state (first/last fetch time, last
    * hash, two counters), emitted every micro-batch with an update
    * counter — the latest emission per URL is current, and
    * [[graft.ops.Curation.recrawlRank]] ranks the drained table with
    * the SAME integer arithmetic as the batch op, so both engines
    * share one oracle. Within a batch arrivals fold in `(ts, hash)`
    * order (the batch op's tie-proof order); ACROSS batches arrivals
    * are assumed in event-time order — a late fetch folds at its
    * arrival position, the same in-order caveat the beacon stream
    * documents. `stateTtl` evicts URLs idle past the TTL (the
    * uniform contract).
    */
  def recrawlStatsStream(fetches: DataFrame,
      urlCol: String = "url_key", tsCol: String = "ts",
      contentCol: String = "content_hash",
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[RecrawlRow] = {
    import org.apache.spark.sql.streaming.{GroupState, OutputMode}
    val spark = fetches.sparkSession
    import spark.implicits._
    fetches.where(col(urlCol).isNotNull && col(tsCol).isNotNull &&
        col(contentCol).isNotNull)
      .select(col(urlCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("us"),
        col(contentCol).cast("string").as("h"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtl))(
        (u: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[RecrawlState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.map(r => (r._2, r._3)).toArray.sortInPlace()
            var st = state.getOption.getOrElse(
              RecrawlState(sorted.head._1, sorted.head._1, null, 0L, 0L,
                0L))
            sorted.foreach { case (us, h) =>
              val flip = st.lastH != null && st.lastH != h
              st = RecrawlState(math.min(st.firstUs, us),
                math.max(st.lastUs, us), h, st.n + 1,
                st.chg + (if (flip) 1L else 0L), st.upd)
            }
            st = st.copy(upd = st.upd + 1)
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single(RecrawlRow(u, st.n, st.chg,
              st.lastUs / 1000000L - st.firstUs / 1000000L,
              st.lastUs / 1000000L, st.upd))
          }
        })
  }

  case class PriState(items: List[(Double, Long, Long)], upd: Long)

  case class PriRow(label: String, upd: Long, rank: Int, doc_id: Long,
    weight: Long, priority: Double, tau: Double)

  /** Streaming twin of [[graft.ops.Curation.prioritySample]]
    * (Duffield–Lund–Thorup priority sampling): per-stratum state is
    * the SAME bounded (k+1)-heap the batch `topk_rows` aggregate
    * keeps — merge the batch's arrivals, keep the k+1 best
    * priorities, emit the current sample + threshold every
    * micro-batch (Update mode; the latest emission per label is the
    * answer, tagged by the `upd` counter so a sink can keep the max).
    * Priorities are a pure function of (id, weight) via the mix31
    * draw, so the final sample is arrival-order-INDEPENDENT — batch
    * and stream agree on any partitioning of the input, which is what
    * lets the two share one oracle. State is O(k) per label
    * regardless of stream length; `stateTtl` arms per-key eviction
    * for label spaces that churn.
    */
  def prioritySampleStream(docs: DataFrame, k: Int = 10,
      labelCol: String = "source", textCol: String = "text",
      idCol: String = "doc_id", stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[PriRow] = {
    import org.apache.spark.sql.streaming.{GroupState, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(k >= 1, s"k must be positive, got $k")
    docs.where(col(labelCol).isNotNull && col(textCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("weight"))
      .withColumn("np", -(col("weight").cast("double") * 2147483648.0 /
        (graft.ops.Similarity.mix31Col(col("doc_id")) + 1L)
          .cast("double")))
      .select("label", "np", "doc_id", "weight")
      .as[(String, Double, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtl))(
        (label: String, rows: Iterator[(String, Double, Long, Long)],
         state: GroupState[PriState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(PriState(Nil, 0L))
            // tuple ordering = the batch aggregate's struct ordering:
            // (np asc = priority desc, doc_id asc)
            val merged = (prev.items ++
              rows.map(r => (r._2, r._3, r._4))).sorted.take(k + 1)
            val upd = prev.upd + 1
            state.update(PriState(merged, upd))
            stateTtl.foreach(state.setTimeoutDuration)
            val tau = if (merged.size == k + 1) -merged.last._1 else 0.0
            merged.take(k).iterator.zipWithIndex.map {
              case ((np, id, w), i) =>
                PriRow(label, upd, i + 1, id, w, -np, tau)
            }
          }
        })
  }

  case class MgState(counts: Map[Long, Long], processed: Long)

  case class MgRow(bucket: Int, item: Long, est: Long, processed: Long)

  /** Streaming Misra-Gries heavy-hitter CANDIDATES: the ingest-time
    * twin of [[graft.ops.HeavyHitters.topByCount]]'s sketch pass.
    * Keys hash into `buckets` state groups; each group folds its
    * arrivals into a capacity-`k` Misra-Gries counter map held in
    * `mapGroupsWithState`. Per-bucket undercount is ≤ n_bucket/(k+1)
    * and the errors ADD across buckets, so any item with total stream
    * count > N/(k+1) is guaranteed present in the union of bucket
    * sketches — arrival order changes the estimates, never that
    * guarantee. Downstream, an exact-verify join (batch or a second
    * scan) makes the final answer deterministic, exactly like the
    * batch op; q150 runs that join through the oracle gate.
    *
    * State is ≤ k longs per bucket FOREVER (NoTimeout) — bounded by
    * construction, no watermark needed: that is the whole point of
    * the sketch. Emits each bucket's full sketch every micro-batch
    * (Update mode): the latest emission per bucket is the current
    * candidate set.
    */
  def heavyHittersStream(events: DataFrame, keyCol: String = "user_id",
      k: Int = 4096, buckets: Int = 32, stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[MgRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull)
      .select(pmod(xxhash64(col(keyCol)), lit(buckets)).cast("int").as("b"),
        col(keyCol).cast("long").as("v"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtl))(
        (bucket: Int, rows: Iterator[(Int, Long)],
         state: GroupState[MgState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
            val m = scala.collection.mutable.LongMap.empty[Long]
            prev.counts.foreach { case (i, c) => m(i) = c }
            var processed = prev.processed
            rows.foreach { case (_, v) =>
              processed += 1
              if (m.contains(v)) m(v) += 1
              else if (m.size < k) m(v) = 1
              else {
                val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
                m.foreachEntry { (key, c) =>
                  if (c == 1L) dead += key else m(key) = c - 1
                }
                dead.foreach(m.remove)
              }
            }
            state.update(MgState(m.toMap, processed))
            stateTtl.foreach(state.setTimeoutDuration)
            val p = processed
            m.iterator.map { case (item, est) => MgRow(bucket, item, est, p) }
          }
        })
  }

  /** Streaming windowed leaderboard counts: tumbling event-time
    * windows × event type, the aggregate feeding a per-window top-k
    * (ranking happens on the drained result — window functions are
    * not streaming-incremental, the counts are). Complete-mode drain
    * emits trailing windows too, so a backfill replay equals the
    * batch window aggregate and shares its oracle.
    */
  def leaderboardStream(events: DataFrame,
      windowDuration: String = "6 hours",
      watermarkDelay: String = "10 minutes", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    events.withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermarkDelay)
      .where(col(typeCol).isNotNull && col("__ts").isNotNull)
      .groupBy(window(col("__ts"), windowDuration),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"))

  /** Per-key funnel progress: earliest first-step time and the
    * earliest second-step at-or-after it. `-1` = not seen.
    */
  case class FunnelState(firstUs: Long, secondUs: Long)

  case class FunnelRow(user_id: Long, first_us: Long,
      second_us: Option[Long], converted: Int)

  /** Streaming two-step funnel — the serving twin of
    * [[graft.ops.Analytics.funnel]]: per key, track the earliest
    * `firstType` event and the earliest `secondType` at-or-after it;
    * emit the key's current funnel row after each batch that touches
    * it (`converted` = second within `windowUs` of first). Two longs
    * of state per key, like the token-bucket stream.
    *
    * Parity contract: a single-microbatch replay reproduces the batch
    * fold exactly (each batch sorts its per-key rows and resolves the
    * at-or-after constraint after folding, the batch op's own order).
    * Across batches the fold stays exact while arrival respects
    * event-time order per key (the watermark regime); a FIRST-step
    * event arriving after a batch boundary BEHIND already-seen
    * second-steps can undercount conversions — those seconds were
    * discarded as pre-first. That loss window is bounded by the
    * source's disorder, the same bound every watermarked op here
    * carries. A later emission for a key supersedes earlier ones
    * (last-write-wins on `user_id`).
    */
  /** Running per-label vector sums: `n` vectors folded, micro-unit
    * coordinate sums (size = dim). */
  case class SeqPairState(lo: Map[String, Long], hi: Map[String, Long])

  case class SeqTypeRow(u: Long, t: String, lo: Long, hi: Long)

  /** Streaming per-user (type → first/last timestamp) maintenance —
    * the ingest-time twin of [[graft.ops.Analytics
    * .sequentialPairSupport]]'s fold: min/max are commutative, so
    * batching and arrival order can never change the state. After
    * each batch a touched user re-emits its full per-type row set;
    * latest emission wins. State per user is 2·|seen types| longs —
    * catalog-bounded, no timeout needed. The a→b support aggregation
    * runs over the drained state table via the SAME shared tail as
    * the batch op, so q305's oracle applies verbatim to a
    * single-batch replay.
    */
  def seqPairStream(events: DataFrame, typeCol: String = "event_type",
      userCol: String = "user_id", tsCol: String = "ts",
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[SeqTypeRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).cast("long").as("u"), col(typeCol).as("t"),
        expr(s"unix_micros($tsCol)").as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (u: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[SeqPairState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(
              SeqPairState(Map.empty, Map.empty))
            rows.foreach { case (_, t, us) =>
              st = SeqPairState(
                st.lo.updated(t, st.lo.get(t).fold(us)(math.min(_, us))),
                st.hi.updated(t, st.hi.get(t).fold(us)(math.max(_, us))))
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            st.lo.keysIterator.toSeq.sorted.iterator
              .map(t => SeqTypeRow(u, t, st.lo(t), st.hi(t)))
          }
        })
  }

  case class BeaconState(lastUs: Long, counts: Map[Long, Long])

  case class BeaconRow(u: Long, t: String, gap_bucket: Long, c: Long)

  /** Streaming inter-arrival histogram per (user, type) — the
    * ingest-time twin of [[graft.ops.Security.beaconing]]'s fold.
    * Each batch slice is sorted (us, id) and walked against the
    * carried last-arrival, so gap buckets accumulate across batches;
    * a touched key re-emits its full histogram (latest emission per
    * (key, bucket) wins — counts only grow). CONTRACT: per-key
    * arrival must be batch-monotone (a later batch never carries an
    * earlier event) — the single-batch gate replay satisfies it
    * trivially, and a production feed would enforce it with a
    * watermark-buffered sort upstream. State is last_us + the bucket
    * map (bounded by the distinct-gap count of the key).
    */
  def beaconStream(events: DataFrame,
      gapBucketUs: Long = 21600000000L, stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[BeaconRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").cast("long").as("u"), col("event_type").as("t"),
        expr("unix_micros(ts)").as("us"), col("event_id").cast("long").as("id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (key: (Long, String), rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[BeaconState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(
              BeaconState(Long.MinValue, Map.empty))
            var last = st.lastUs
            var counts = st.counts
            rows.toSeq.sortBy(r => (r._3, r._4)).foreach { r =>
              if (last != Long.MinValue) {
                val b = (r._3 - last) / gapBucketUs
                counts = counts.updated(b, counts.getOrElse(b, 0L) + 1L)
              }
              last = r._3
            }
            state.update(BeaconState(last, counts))
            stateTtl.foreach(state.setTimeoutDuration)
            counts.toSeq.sortBy(_._1).iterator
              .map { case (b, c) => BeaconRow(key._1, key._2, b, c) }
          }
        })
  }

  case class SprayState(counts: Map[Long, Long])

  case class SprayRow(t: String, h: Long, u: Long, c: Long)

  /** Streaming per-(type, hour) user-count maintenance — the
    * ingest-time twin of [[graft.ops.Security.spray]]'s inner fold:
    * additive counts commute, so batching cannot change the state. A
    * touched window re-emits its full per-user table (latest emission
    * per (key, user) wins — counts only grow). State per key is the
    * hour's distinct-user count map; hour keys stop growing an hour
    * after their window passes — pass `stateTtl` (e.g. `"2 hours"`)
    * to evict closed hours, the shared [[ttlTimeout]] contract.
    */
  def sprayStream(events: DataFrame, stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[SprayRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_type").as("t"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        col("user_id").cast("long").as("u"))
      .as[(String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (key: (String, Long), rows: Iterator[(String, Long, Long)],
         state: GroupState[SprayState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
            rows.foreach { case (_, _, u) =>
              counts = counts.updated(u, counts.getOrElse(u, 0L) + 1L)
            }
            state.update(SprayState(counts))
            stateTtl.foreach(state.setTimeoutDuration)
            counts.toSeq.sortBy(_._1).iterator
              .map { case (u, c) => SprayRow(key._1, key._2, u, c) }
          }
        })
  }

  case class RfmState(lastD: Long, f: Long, mC: Long)

  case class RfmRow(u: Long, last_d: Long, f: Long, m_c: Long)

  /** Streaming per-user RFM maintenance — the ingest-time twin of
    * [[graft.ops.Analytics.rfmSegments]]'s fold: max / count / sum
    * all commute, so arrival order and batching can never change the
    * state (three longs per user). Latest emission per user is the
    * serving row; the quintile scoring runs over the drained state
    * via the SAME shared tail as the batch op, so q322's oracle
    * applies verbatim to a single-batch replay.
    */
  def rfmStream(events: DataFrame, stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[RfmRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").cast("long").as("u"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (u: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[RfmState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(RfmState(Long.MinValue, 0L, 0L))
            rows.foreach { case (_, d, vc) =>
              st = RfmState(math.max(st.lastD, d), st.f + 1L, st.mC + vc)
            }
            state.update(st)
            stateTtl.foreach(state.setTimeoutDuration)
            Iterator.single(RfmRow(u, st.lastD, st.f, st.mC))
          }
        })
  }

  case class CentroidState(n: Long, sums: Seq[Long])

  case class CentroidRow(label: Int, idx: Int, n: Long, sum_micro: Long,
      mean_micro: Long)

  /** Streaming per-label centroid maintenance — the ingest-time twin
    * of [[graft.ops.Similarity.labelCentroidsMicro]]: every arriving
    * vector floors its coordinates to micro-longs and adds them into
    * the label's running sum (integer addition commutes, so arrival
    * order and batching can never change the state — the exact
    * property the batch op's contract pins). After each batch a
    * touched label re-emits its full centroid row set; the latest
    * emission per (label, idx) is the serving value (LWW).
    *
    * State per label is dim+1 longs. A drained single-batch replay
    * equals the batch op bit for bit, so q66's oracle applies
    * verbatim.
    */
  def centroidStream(embeddings: DataFrame, dim: Int = 64,
      labelCol: String = "label", vecCol: String = "embedding",
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[CentroidRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .where(col(labelCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) === dim)
      .select(col(labelCol).cast("int").as("lab"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Int, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (label: Int, rows: Iterator[(Int, Seq[Double])],
         state: GroupState[CentroidState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(
              CentroidState(0L, Vector.fill(dim)(0L)))
            val sums = st.sums.toArray
            var n = st.n
            rows.foreach { case (_, v) =>
              var i = 0
              while (i < dim) {
                sums(i) += math.floor(v(i) * 1e6).toLong
                i += 1
              }
              n += 1L
            }
            state.update(CentroidState(n, sums.toVector))
            stateTtl.foreach(state.setTimeoutDuration)
            (0 until dim).iterator.map(i =>
              CentroidRow(label, i, n, sums(i), Math.floorDiv(sums(i), n)))
          }
        })
  }

  def funnelStream(events: DataFrame, firstType: String, secondType: String,
      windowUs: Long = 3600000000L, keyCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[FunnelRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(firstType, secondType))
      .select(col(keyCol).cast("long").as("k"),
        (col(typeCol) === firstType).as("isFirst"),
        unix_micros(col(tsCol)).as("us"))
      .as[(Long, Boolean, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtl))(
        (key: Long, rows: Iterator[(Long, Boolean, Long)],
         state: GroupState[FunnelState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toIndexedSeq
            var st = state.getOption.getOrElse(FunnelState(-1L, -1L))
            // batch-fold order: settle the earliest first, THEN scan
            // seconds at-or-after it — the exact shape of the batch op
            val batchFirst = batch.collect { case (_, true, us) => us }
            val newFirst =
              (batchFirst ++ Option.when(st.firstUs >= 0)(st.firstUs)).minOption
                .getOrElse(-1L)
            if (newFirst >= 0) {
              val cand = batch.collect {
                case (_, false, us) if us >= newFirst => us
              } ++ Option.when(st.secondUs >= newFirst && st.secondUs >= 0)(
                st.secondUs)
              st = FunnelState(newFirst, cand.minOption.getOrElse(-1L))
              state.update(st)
              stateTtl.foreach(state.setTimeoutDuration)
              Iterator.single(FunnelRow(key, st.firstUs,
                Option.when(st.secondUs >= 0)(st.secondUs),
                if (st.secondUs >= 0 && st.secondUs - st.firstUs <= windowUs) 1
                else 0))
            } else {
              // seconds-only so far: hold nothing. Under in-order
              // arrival a first that shows up later has a LATER
              // event time, so these seconds are < first_us and the
              // batch op drops them too; only a late (out-of-order)
              // first loses them — the documented undercount window.
              Iterator.empty
            }
          }
        })
  }
}

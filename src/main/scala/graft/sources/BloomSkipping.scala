package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Bloom

/** Per-file Bloom-filter index — Delta/Iceberg-style point-lookup
  * file skipping for a plain parquet directory, complementing
  * [[Skipping]]'s min/max manifest: range stats prune RANGE
  * predicates on the clustering dimensions, but are useless for a
  * point lookup on a high-cardinality column orthogonal to the file
  * layout (the classic case: logs laid out by time, looked up by
  * user — a GDPR subject-access scan, an incident triage). A small
  * per-file bitmap answers "might this file contain key k?" without
  * opening the file.
  *
  * One distributed pass builds the index: each row sets its two
  * probe bits ([[Bloom.pos]], the engine-portable mix31 probes —
  * same bit layout as the driver-held join filter, so the two
  * features stay mutually verifiable), `bit_or` partial-aggregates
  * map-side, and each file's words land as ONE array row in a tiny
  * `<dir>_bloomidx` table — O(files) rows, like the stats manifest.
  *
  * Lookup is driver-cheap: the probe positions of a literal key are
  * computed with [[Bloom.posLong]] (no Spark job), the manifest is
  * filtered to files whose bitmap has both bits set for ANY wanted
  * key, and only the surviving files are scanned; the exact `IN`
  * predicate still runs on the survivors, so a false positive costs
  * one extra file read, never a wrong row. False negatives are
  * impossible (every inserted key set its bits), so the pruned read
  * is row-for-row the full scan — the oracle needs no bloom
  * restatement.
  *
  * At 100 TB: the index is ~`mBits/8` bytes per file (8 KiB at the
  * default) — 100k files is under a GiB, read once per lookup and
  * filtered on the driver; the data scan touches only the files a
  * key actually lives in. Sizing: with two probes a file of n keys
  * has FP rate ≈ (1−e^(−2n/m))²; the default m=2^16 holds ~3% at
  * n=6k keys/file — raise `mBits` for bigger files.
  */
object BloomSkipping {

  def indexPath(dir: String): String = s"${dir.stripSuffix("/")}_bloomidx"

  /** One distributed scan → per-file bloom bitmap over `keyCol`,
    * written as the `<dir>_bloomidx` manifest (`__file`, `words`:
    * array of mBits/64 longs). Null keys set no bits — a null can
    * never equal a point-lookup key, so skipping them loses nothing.
    */
  def buildIndex(spark: SparkSession, dir: String, keyCol: String,
      mBits: Int = 1 << 16): Unit = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
    val nWords = mBits / 64
    spark.read.parquet(dir)
      .select(input_file_name().as("__file"), col(keyCol).as("k"))
      .where(col("k").isNotNull)
      .select(col("__file"), explode(array(
        Bloom.pos(col("k"), 0L, mBits),
        Bloom.pos(col("k"), Bloom.Salt, mBits))).as("p"))
      .select(col("__file"), shiftright(col("p"), 6).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(64L)).cast("int")).as("b"))
      .groupBy("__file", "w").agg(expr("bit_or(b)").as("bits"))
      .groupBy("__file")
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("m"))
      .select(col("__file"),
        transform(sequence(lit(0), lit(nWords - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L))).as("words"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(indexPath(dir))
  }

  /** Files whose bitmap claims ANY of `keys` might be present. The
    * probe positions are driver-computed constants; the manifest
    * filter is pure column arithmetic over the words array.
    */
  def candidateFiles(spark: SparkSession, dir: String,
      keys: Seq[Long]): Seq[String] = {
    require(keys.nonEmpty, "candidateFiles needs at least one key")
    val idx = spark.read.parquet(indexPath(dir))
    // infer the build-time sizing from the manifest itself so callers
    // can't probe with a mismatched mBits
    val nWords = idx.select(size(col("words")).as("n")).first().getAs[Int]("n")
    val mBits = nWords * 64
    val pred = keys.map { k =>
      Seq(0L, Bloom.Salt).map { salt =>
        val p = Bloom.posLong(k, salt, mBits)
        element_at(col("words"), (p >> 6).toInt + 1)
          .bitwiseAND(lit(1L << (p & 63))) =!= 0L
      }.reduce(_ && _)
    }.reduce(_ || _)
    idx.where(pred).select("__file").collect().map(_.getString(0)).toSeq
  }

  /** Point-lookup read through the index: scan only files that might
    * hold a wanted key, then apply the exact `IN` on the survivors —
    * row-for-row the full-scan answer.
    */
  def readKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long]): DataFrame = {
    val files = candidateFiles(spark, dir, keys)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.where(col(keyCol).isin(keys: _*))
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Temporal

/** Hash-bucketed copy-on-write upsert table — the MERGE INTO /
  * Delta-style mutable-view primitive, built so the rewrite cost
  * scales with the DELTA, not the table:
  *
  *   - rows live under `bucket=N/` hive partitions,
  *     `N = pmod(xxhash64(key), buckets)` — a key's row can only ever
  *     be in ONE directory;
  *   - a merge buckets the incoming batch, reads ONLY the touched
  *     buckets (partition-pruned scan), resolves each key
  *     last-writer-wins by `(ts, tie)`, and rewrites ONLY those
  *     directories (dynamic partition overwrite);
  *   - deletes are tombstone rows (`deleted = true`) that KEEP their
  *     `(ts, tie)` — so a late-arriving stale update loses to the
  *     tombstone instead of resurrecting the row. [[read]] filters
  *     tombstones; storage retains them.
  *
  * LWW by `(ts, tie)` makes merge ASSOCIATIVE and COMMUTATIVE across
  * batches: any partition of the update stream into merges — and any
  * arrival order — converges to the same table. That is what makes
  * the streaming upsert (foreachBatch over micro-batches of unknown
  * split) oracle-checkable against one global latest-row-per-key
  * statement.
  *
  * At 100 TB: `buckets` sizes the rewrite quantum (table/buckets
  * bytes per touched bucket); a wide update batch touches all
  * buckets and degrades to a full rewrite — the same worst case as
  * any COW table. The touched-bucket list is `≤ buckets` longs on
  * the driver, never data-sized.
  */
object KeyedTable {

  def bucketOf(key: Column, buckets: Int): Column =
    pmod(xxhash64(key), lit(buckets.toLong))

  /** Read the current state: tombstones filtered, scratch bucket
    * column dropped. Key equality predicates placed on top still
    * prune to one bucket directory (the bucket column is a partition
    * column underneath).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(dir)
      .where(!col("deleted")).drop("bucket")

  /** Merge `source` into the table at `dir` (creating it if absent).
    * `source` must carry the key, `tsCol`, `tieCol`, and may carry a
    * boolean `deleted` column (absent = all upserts). Returns the
    * post-merge read view.
    */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keyCol: String, tsCol: String = "ts", tieCol: String = "event_id",
      buckets: Int = 16): DataFrame = {
    val withDel =
      if (source.columns.contains("deleted")) source
      else source.withColumn("deleted", lit(false))
    val src = withDel.withColumn("bucket", bucketOf(col(keyCol), buckets))
    val exists = new java.io.File(dir).exists()
    val merged = if (!exists) {
      Temporal.latestByKey(src, Seq(keyCol), tsCol, tieCol)
    } else {
      val touched = src.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      val tgt = spark.read.option("basePath", dir).parquet(dir)
        .where(col("bucket").isin(touched: _*)) // partition-pruned
      Temporal.latestByKey(tgt.unionByName(src), Seq(keyCol), tsCol, tieCol)
    }
    // materialize BEFORE overwriting the directories being read, and
    // scope dynamic partition overwrite so untouched buckets survive.
    // (r14 note: a bucket-clustered repartition before this write was
    // measured and REVERTED — AQE already coalesces the merge window's
    // output to ~1 task at bench scale, so partitionBy emits ~1 file
    // per bucket either way and the extra exchange only added cost; at
    // production scale insert a REBALANCE(bucket) here — guide §6.)
    val frozen = merged.localCheckpoint()
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(mode, "STATIC")
    spark.conf.set(mode, "dynamic")
    try frozen.write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(dir)
    finally spark.conf.set(mode, prev)
    read(spark, dir)
  }

  /** HARD delete: physically remove every row whose key is in `keys`
    * from storage — tombstones included — by rewriting only the
    * buckets those keys hash to. A tombstone says "this key reads as
    * absent (and stale updates stay dead)"; purge says "this key was
    * never here" — the erasure-request compliance op a logical delete
    * cannot satisfy. The touched bucket directories are dropped
    * before the rewrite (dynamic overwrite can't, because a bucket
    * whose every row is purged has no rows left to carry the
    * partition), so a fully-purged bucket ends empty, not stale.
    */
  def purge(spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String, buckets: Int = 16): DataFrame = {
    val k = keys.select(col(keyCol)).distinct()
      .withColumn("bucket", bucketOf(col(keyCol), buckets))
      .localCheckpoint()
    val touched = k.select("bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    val all = spark.read.option("basePath", dir).parquet(dir)
    if (touched.nonEmpty) {
      val tgt = all.where(col("bucket").isin(touched: _*))
      val kept = tgt.join(k.select(keyCol), Seq(keyCol), "left_anti")
        .localCheckpoint() // materialize BEFORE deleting source dirs
      touched.foreach { b =>
        val d = new java.io.File(dir, s"bucket=$b")
        Option(d.listFiles()).foreach(_.foreach(f => f.delete(): Unit))
        d.delete(): Unit
      }
      kept.write.mode(SaveMode.Append).partitionBy("bucket").parquet(dir)
    }
    // a purge can empty the table entirely — no files left to infer a
    // schema from, so the read view falls back to the schema captured
    // before the rewrite
    val anyLeft = Option(new java.io.File(dir).listFiles())
      .exists(_.exists(_.getName.startsWith("bucket=")))
    if (anyLeft) read(spark, dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        all.schema.filterNot(_.name == "bucket")))
  }
}

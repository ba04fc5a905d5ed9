package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping statistics manifest — Delta/Iceberg-style data
  * skipping for a plain parquet directory: one distributed pass
  * records per-file min/max of the named columns into a tiny
  * `<dir>_manifest` table; range queries then list the manifest
  * (file-count-sized, driver-cheap), keep only files whose
  * [min, max] interval overlaps the predicate, and scan just those.
  *
  * Pairs with [[ZOrder.write]]: z-ordered files have TIGHT min/max on
  * both clustered dimensions, so the manifest prunes on either column
  * — that is the reason to z-order at all. On a 100 TB lake the
  * manifest is ~one row per file (O(100k) rows), the prune is a
  * driver filter over it, and the data scan touches only surviving
  * files; the residual predicate still evaluates exactly, so pruning
  * is a pure optimization, never a semantics change.
  */
object Skipping {

  def manifestPath(dir: String): String = s"${dir.stripSuffix("/")}_manifest"

  /** One distributed scan → per-file min/max for `cols`, written as
    * the manifest. Columns land as `<c>_min` / `<c>_max`.
    */
  def buildManifest(spark: SparkSession, dir: String,
      cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(dir)
      .withColumn("__file", input_file_name())
      .groupBy("__file").agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath(dir))
  }

  /** The files whose `[min, max]` stats interval overlaps `[lo, hi]`
    * — null-stat files (all-null column chunk) are kept, not skipped:
    * absence of stats must never drop data.
    */
  def candidateFiles(spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): Seq[String] = {
    spark.read.parquet(manifestPath(dir))
      .where(col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
        !(col(s"${c}_max") < lo || col(s"${c}_min") > hi))
      .select("__file").collect().map(_.getString(0)).toSeq
  }

  /** Range read through the manifest: scan only overlapping files,
    * then apply the exact predicate to the survivors.
    */
  def readRange(spark: SparkSession, dir: String, c: String,
      lo: Long, hi: Long): DataFrame = {
    val files = candidateFiles(spark, dir, c, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.where(col(c) >= lo && col(c) <= hi)
  }
}

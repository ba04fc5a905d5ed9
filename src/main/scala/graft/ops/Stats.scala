package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributional statistics over metric columns, built integer-exact
  * so every op carries a full oracle: float moments (mean/variance)
  * are order-dependent under double summation, so everything here
  * works in micro-unit longs with wide exact sums.
  */
object Stats {

  /** Population z-score outlier flags without ever computing a float
    * moment: with `vm = floor(value·10⁶)`, `S = Σvm`, `Q = Σvm²`,
    * `n` per group,
    *
    *   |z_i| > k  ⟺  (n·vm_i − S)² > k²·(n·Q − S²)
    *
    * — both sides integer-exact (the right side is n² times the
    * population variance in micro² units). Returns the flagged rows.
    *
    * Shape: one map-side-combinable groupBy over the group key (S and
    * Q are plain sums — a 100 TB scan folds to |groups| rows), stats
    * broadcast back onto the stream, flag is a map-only predicate.
    * Sums are decimal(38) so a trillion-row group can't overflow.
    */
  def zscoreOutliers(events: DataFrame, groupCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id",
      k: Int = 3): DataFrame = {
    val base = events
      .where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(idCol), col(groupCol),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
    val stats = base.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col("vm").cast("decimal(20,0)")).as("s"),
      // vm² ≤ ~3·10¹⁷ fits a long; the SUM is where width is needed
      sum((col("vm") * col("vm")).cast("decimal(38,0)")).as("q"))
    val dev = col("n") * col("vm") - col("s")
    base.join(broadcast(stats), Seq(groupCol))
      .where(dev * dev > lit(k.toLong * k) * (col("n") * col("q") - col("s") * col("s")))
      .select(col(idCol), col(groupCol), col("vm"))
      .orderBy(idCol)
  }

  /** Per-group equi-depth histogram: `buckets` equal-count bins via
    * ntile over the deterministic (value, id) order, folded to one
    * row per (group, bin) with count and micro-unit bounds — the
    * feature-bucketization table (and the input to equi-depth
    * binning of a model feature) computed exactly, where
    * approx_percentile would be the sketch. Sorting is bounded per
    * GROUP partition (one key shuffle), never global.
    */
  def equiDepthHistogram(events: DataFrame, buckets: Int = 10,
      groupCol: String = "event_type", valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col("vm"), col(idCol))
    events
      .where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol), col(idCol),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
      .withColumn("bin", ntile(buckets).over(w))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"),
        min("vm").as("lo_micro"), max("vm").as("hi_micro"))
      .orderBy(groupCol, "bin")
  }

  /** Per-group min-max normalization to ppm of the group's range —
    * `(vm − min)·10⁶ // (max − min)`, constant groups pin to 0. The
    * feature-scaling map as exact integer arithmetic: one bounded
    * group aggregate broadcast back, then a map-only rescale.
    */
  def minMaxNormalize(events: DataFrame, groupCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val base = events
      .where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(idCol), col(groupCol),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
    val ranges = base.groupBy(groupCol)
      .agg(min("vm").as("lo"), max("vm").as("hi"))
    base.join(broadcast(ranges), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        when(col("hi") === col("lo"), 0L)
          .otherwise(expr("((vm - lo) * 1000000) div (hi - lo)"))
          .as("norm_ppm"))
      .orderBy(idCol)
  }
}

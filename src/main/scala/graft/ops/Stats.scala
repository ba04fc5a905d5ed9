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

  /** Robust (median/MAD) outlier flags, integer-exact: with
    * `vm = floor(value·10⁶)`, the group median is the LOWER median —
    * the value at row_number `(n+1) div 2` in `(vm, id)` order — and
    * MAD is the same rank statistic over `|vm − med|`. A row is
    * flagged when `|vm − med| > k·MAD` (strict, so a zero-MAD group —
    * more than half one value — flags only rows off the median). The
    * z-score gate ([[zscoreOutliers]]) breaks under the outliers it
    * hunts (they inflate σ); rank statistics don't, which is why
    * data-quality gates on crawled corpora want MAD.
    *
    * Every statistic is a value AT a rank, never an average of two —
    * the lower-median convention keeps the whole op in BIGINT and
    * engine-portable (no even/odd interpolation to disagree on).
    *
    * Shape: two per-GROUP sort windows (rank within group — bounded
    * by the group's partition, never a global sort) with the
    * group-sized median tables broadcast back; the flag itself is a
    * map-only predicate. Same 100 TB contract as
    * [[equiDepthHistogram]]: one key shuffle per ranking pass.
    */
  def madOutliers(events: DataFrame, groupCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id",
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events
      .where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(idCol), col(groupCol),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
    def medianAtRank(df: DataFrame, c: String, out: String): DataFrame = {
      val w = Window.partitionBy(groupCol).orderBy(col(c), col(idCol))
      val n = Window.partitionBy(groupCol)
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(n))
        .where(col("rn") === expr("(cnt + 1) div 2"))
        .select(col(groupCol), col(c).as(out))
    }
    val med = medianAtRank(base, "vm", "med")
    val dev = base.join(broadcast(med), Seq(groupCol))
      .withColumn("ad", abs(col("vm") - col("med")))
    val mad = medianAtRank(dev, "ad", "mad")
    dev.join(broadcast(mad), Seq(groupCol))
      .where(col("ad") > lit(k.toLong) * col("mad"))
      .select(col(idCol), col(groupCol), col("vm"), col("med"), col("mad"))
      .orderBy(idCol)
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

  /** Leave-one-out target encoding — the standard anti-leakage
    * categorical encoder for gradient-boosting / linear features:
    * each row's encoding is its group's target mean COMPUTED WITHOUT
    * THE ROW ITSELF, `floor((Σ_grp vm − vm) / (cnt − 1))` in
    * micro-units. Exact integer arithmetic end to end (values here
    * are non-negative so `div` == floor; a signed corpus would spell
    * out floor(), the q66 rule). Singleton groups are excluded — LOO
    * is undefined there (a production pipeline substitutes the global
    * prior; that row set is exactly the `c = 1` complement).
    *
    * Scale shape: one map-side-combinable aggregate over the group
    * key, broadcast back (group cardinality is bounded — event types,
    * categories), map-only encode. No window over the group: a
    * whole-partition window would shuffle every row into as many
    * partitions as there are groups — the classic skew trap for
    * low-cardinality keys.
    */
  def looTargetEncode(events: DataFrame, groupCol: String = "event_type",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val t = events.where(col(groupCol).isNotNull && col(valCol).isNotNull)
      .select(col(idCol).as("event_id"), col(groupCol).as("grp"),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
    val agg = t.groupBy("grp")
      .agg(sum(col("vm")).as("s"), count(lit(1)).as("c"))
    t.join(broadcast(agg), Seq("grp"))
      .where(col("c") >= 2)
      .select(col("event_id"), col("grp"),
        expr("(s - vm) div (c - 1)").as("loo_micro"))
      .orderBy("event_id")
  }
}

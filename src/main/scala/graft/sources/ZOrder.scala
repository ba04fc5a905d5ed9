package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: interleave the bits of two scaled
  * dimensions so that sorting by the single z-value clusters rows
  * that are close in BOTH dimensions into the same file. A lake laid
  * out this way data-skips on either column — per-file min/max
  * parquet stats stay tight on x AND y simultaneously, where a plain
  * sort keeps only its leading column tight and leaves every file
  * spanning the full range of the other (the multi-dimensional
  * clustering Delta/Iceberg expose as `OPTIMIZE ZORDER BY`).
  *
  * Everything here is exact integer arithmetic on scaled ranks —
  * floor-scaling to a fixed bit budget, then a shift-and-mask
  * interleave — so the z-value itself is engine-portable and
  * oracle-checkable, not just the layout.
  *
  * At 100 TB the shape is: one pass for the two min/max pairs (a
  * 4-value broadcast), a map-only z projection, and ONE range
  * shuffle on z (`repartitionByRange` samples boundaries — no global
  * sort). File count = the range partition count; row order inside a
  * file is z (`sortWithinPartitions`), keeping row-group stats tight
  * too.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * x's bit i lands at 2i, y's at 2i+1. Plain shift/mask/sum column
    * arithmetic (2·bits terms, all codegen'd) — no UDF.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"interleave bits $bits out of [1,31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Project the z-value of two numeric columns: one global min/max
    * aggregate (4 values, broadcast), then a map-only floor-scale of
    * each dimension onto `[0, 2^bits)` —
    * `((v − lo)·(2^bits − 1)) div (hi − lo)`, exact integer, constant
    * columns pin to 0 — and the interleave. Appends `zx`, `zy` (the
    * scaled ranks) and `z`. `v·(2^bits−1)` with 16 bits and a
    * micro-scaled metric stays well under 2^63.
    */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16): DataFrame = {
    val span = (1L << bits) - 1
    val ranges = df.agg(
      min(col(xCol)).cast("long").as("__xlo"),
      max(col(xCol)).cast("long").as("__xhi"),
      min(col(yCol)).cast("long").as("__ylo"),
      max(col(yCol)).cast("long").as("__yhi"))
    def scaled(c: String, lo: String, hi: String) =
      when(col(hi) === col(lo), 0L).otherwise(
        expr(s"((cast(`$c` as bigint) - `$lo`) * ${span}L) div (`$hi` - `$lo`)"))
    df.crossJoin(broadcast(ranges))
      .withColumn("zx", scaled(xCol, "__xlo", "__xhi"))
      .withColumn("zy", scaled(yCol, "__ylo", "__yhi"))
      .withColumn("z", interleave(col("zx"), col("zy"), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Write `df` z-ordered on `(xCol, yCol)` into `files` parquet
    * files: range-shuffle on z (sampled boundaries, never a global
    * sort), z-sorted within each file. The scratch z columns don't
    * land in the files.
    */
  def write(df: DataFrame, dir: String, xCol: String, yCol: String,
      files: Int = 16, bits: Int = 16): Unit = {
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions("z")
      .drop("zx", "zy", "z")
      .write.mode("overwrite").parquet(dir)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal operators Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder — no custom physical
  * operator needed, and the composition keeps Catalyst fully in
  * charge of the shuffle plan).
  */
object Temporal {

  /** Latest-version compaction (the CDC/upsert read view): keep each
    * key's newest row by event time, ties broken by the id column —
    * the "current state" materialization every mutable-source mirror
    * (user profiles, device inventory, doc revisions) compacts to
    * before analytics run.
    *
    * ONE shuffle keyed by the key columns; the max_by-shaped window
    * never sorts more than a key's own rows. At lake scale this is the
    * nightly compaction job — pair with [[graft.sources.Lake]] to
    * rewrite the view hive-partitioned.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    // rank column name chosen to not collide with any input column —
    // a fixed "__rn" would silently clobber (then drop) a caller's
    // same-named data column
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
  }

  /** As-of join: each left row picks the latest right row with the
    * same key and right ts <= left ts (point-in-time enrichment — the
    * lookup that makes training-data features leak-free).
    *
    * Implementation: tag and union both sides, then one window pass
    * per key carrying the last-seen right payload forward in event
    * time (right sorts before left at equal ts → inclusive semantics,
    * matching DuckDB's `ASOF JOIN ON l.ts >= r.ts`). ONE shuffle on
    * the key — the same cost as a plain join, no range explosion, skew
    * bounded by key cardinality.
    *
    * @param rightCols right-side payload columns to carry (appended
    *                  with `suffix`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], suffix: String = "_r"): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val rightType = StructType(rightCols.map(c => right.schema(c)))
    val l2 = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    // join semantics on the key: NULL never matches NULL (the window
    // partition would otherwise lump all null keys together and carry
    // across them) — null-key right rows can never be picked, null-key
    // left rows keep flowing with null payload
    val r2 = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct, not one last() per column: independent
    // per-column carries would back-fill a NULL in the matched right
    // row from an older row, mixing columns of different right rows
    val carried = last(col("__r"), ignoreNulls = true).over(w).as("__rc")
    l2.unionByName(r2)
      .select(col("__side"), col("__l"), carried)
      .where(col("__side") === 1)
      .select(col("__l.*") +: rightCols.map(c => col(s"__rc.$c").as(c + suffix)): _*)
  }

  /** Interval (range) join: for each left row, right rows of the same
    * key within ±tolerance of its timestamp. The key equality makes
    * this a hash join with a residual range predicate — no nested-loop
    * explosion; skew follows key cardinality like any equi-join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lTs: String, rTs: String, toleranceUs: Long,
      suffix: String = "_r"): DataFrame = {
    val l = left.select(col("*"), unix_micros(col(lTs)).as("__lus"))
    val r = right.select(col(keyCol).as("__rk"), unix_micros(col(rTs)).as("__rus"))
    l.join(r,
        l(keyCol) === r("__rk") &&
          r("__rus") >= l("__lus") - toleranceUs &&
          r("__rus") <= l("__lus") + toleranceUs)
      // matched right timestamp surfaces as a documented column; the
      // internal epoch-micros helpers never leak
      .withColumn(rTs + suffix, timestamp_micros(col("__rus")))
      .drop("__rk", "__rus", "__lus")
  }

  /** Gap-based sessionization: events more than `gapUs` microseconds
    * apart start a new session per key. Two window passes over one
    * key-shuffle, then the per-session aggregate. Timestamps compare
    * in integer epoch-micros so results are engine-exact.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy("__us")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__us"))
      .where(col("__us").isNotNull) // null event times sort differently
                                    // across engines; exclude them
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .groupBy("key", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"), max(col("__us")).as("end_us"))
      .orderBy("key", "session_id")
  }
}

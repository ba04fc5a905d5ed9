package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parallelism guard for compute-heavy per-row stages. Local test
  * files arrive as a single parquet row group = one scan task; a 100
  * TB lake arrives as tens of thousands. When (and only when) the
  * input has fewer partitions than the cluster has slots, spread it —
  * the shuffle of the raw rows is trivially cheaper than running
  * shingling/hashing/vector math on one core.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    // streaming relations can't be probed with .rdd (and micro-batch
    // parallelism is the source rate's job) — pass them through so
    // batch column programs that call spread stay stream-reusable
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // `.rdd` pays a physical-planning pass, but it is the only probe
    // that sees the ACTUAL scan-task count. File count is not a valid
    // proxy in either direction: FilePartition bin-packing merges many
    // small files into few tasks (spread still needed), and one large
    // splittable file yields many tasks (spread not needed).
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Dense global row numbering in total `orderCols` order WITHOUT a
    * single-partition sort: `row_number() OVER (ORDER BY …)` — the
    * obvious spelling — funnels the whole table through one task,
    * which is exactly the plan that dies at 100 TB (Spark even warns
    * "No Partition Defined for Window"). Instead:
    *
    *  1. range-shuffle on the order columns (sampled boundaries —
    *     partition p holds strictly smaller keys than p+1), frozen
    *     with a localCheckpoint so the boundary sampling can't
    *     re-draw between the two passes;
    *  2. count rows per partition — P longs to the driver;
    *  3. prefix-sum the counts into per-partition offsets (driver
    *     arithmetic on P values), broadcast back;
    *  4. number within each partition (bounded sort) and add the
    *     offset.
    *
    * `orderCols` must be a TOTAL order (include a tiebreaker id) —
    * that is what makes the numbering deterministic, and it's
    * enforceable only by contract here.
    *
    * Returns the input columns plus `rownum` (1-based).
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
      parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts
      else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("c"))
      .sortBy(_._1)
      .scanLeft((0, 0L, 0L)) { case ((_, acc, c0), (pid, c)) =>
        (pid, acc + c0, c)
      }.drop(1).map { case (pid, off, _) => (pid, off) }
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__off")
    val w = Window.partitionBy("__pid")
      .orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offDf), "__pid")
      .withColumn("rownum", row_number().over(w) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Grouped INCLUSIVE running sum of `valueCol` in `orderCols` order
    * — the two-pass prefix-offset scan as a reusable primitive (the
    * q157/q161 shape): range-shuffle on (group, order) with the
    * boundary sampling frozen by localCheckpoint, per-(partition,
    * group) partial sums to the driver (P×G longs — driver-safe by
    * construction), prefix offsets broadcast back, bounded
    * within-partition windows. Never a single-partition window, never
    * a per-group sort of the whole table.
    *
    * `groupCols` may be empty (global prefix sum). `orderCols` must
    * be a total order within each group — same contract as
    * [[globalRowNumber]]. Returns the input columns plus `outCol`.
    */
  def prefixSum(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], valueCol: String,
      outCol: String = "cum"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(n, (groupCols ++ orderCols).map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = ranged
      .groupBy((col("__pid") +: groupCols.map(col)): _*)
      .agg(sum(col(valueCol)).as("__ps"))
      .collect()
      .map(r => (r.getInt(0), groupCols.indices.map(i => r.get(i + 1)),
        r.getAs[Long]("__ps")))
    val offsets = parts.groupBy(_._2).toSeq.flatMap { case (key, rows) =>
      rows.sortBy(_._1)
        .scanLeft((0, 0L, 0L)) { case ((_, acc, c0), (pid, _, c)) =>
          (pid, acc + c0, c)
        }.drop(1).map { case (pid, off, _) => (pid, key, off) }
    }
    val schema = StructType(
      StructField("__pid", IntegerType, nullable = false) +:
        groupCols.map(c => ranged.schema(c)) :+
        StructField("__off", LongType, nullable = false))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        offsets.map { case (pid, key, off) => Row.fromSeq(pid +: key :+ off) }),
      schema)
    val w = Window.partitionBy((col("__pid") +: groupCols.map(col)): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offDf), "__pid" +: groupCols)
      .withColumn(outCol, sum(col(valueCol)).over(w) + col("__off"))
      .drop("__pid", "__off")
  }
}

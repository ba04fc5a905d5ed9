package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for compute-heavy per-row stages. Local test
  * files arrive as a single parquet row group = one scan task; a 100
  * TB lake arrives as tens of thousands. When (and only when) the
  * input has fewer partitions than the cluster has slots, spread it —
  * the shuffle of the raw rows is trivially cheaper than running
  * shingling/hashing/vector math on one core.
  */
object Par {
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // `.rdd` pays a physical-planning pass, but it is the only probe
    // that sees the ACTUAL scan-task count. File count is not a valid
    // proxy in either direction: FilePartition bin-packing merges many
    // small files into few tasks (spread still needed), and one large
    // splittable file yields many tasks (spread not needed).
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

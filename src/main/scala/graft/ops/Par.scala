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
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

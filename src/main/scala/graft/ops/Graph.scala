package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics as join + aggregate rounds — the
  * power-iteration shape (PageRank here, and [[DocDedup.clusters]]'s
  * label propagation is the same skeleton) that a relational engine
  * runs at 100 TB without any graph runtime: edges shuffle by `src`
  * for the rank join and by `dst` for the inflow aggregate, both
  * map-side combinable, and each round materializes
  * (localCheckpoint) so lineage stays flat.
  */
object Graph {

  /** Fixed-iteration PageRank in pure integer fixed-point: ranks are
    * parts-per-`scale` of the total mass, the damping multiply and
    * the out-degree split are floor divisions, so every engine (and
    * every retry) computes bit-identical ranks — the property that
    * makes an iterative float algorithm oracle-checkable at all.
    *
    * Variant contract (declared, deterministic): dangling mass is NOT
    * redistributed — a sink node's rank leaks, as in the original
    * sum formulation. Fixed `iterations`, not convergence-tested:
    * ranking stabilizes in a few rounds and a fixed plan depth is
    * what a relational pipeline wants.
    *
    * Shuffle shape: the edge set shuffles ONCE (pre-partitioned by
    * dst, the per-round aggregate key); rank and degree tables are
    * node-sized and broadcast, so each round is broadcast-join +
    * exchange-free aggregate. That explicit broadcast is the
    * nodes ≪ edges regime (every co-occurrence/citation graph);
    * for a graph whose node table outgrows broadcast, drop the hint
    * and pre-partition edges by src instead — rounds then pay one
    * node-keyed shuffle each, never an edge shuffle.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3, dampPpm: Long = 850000L,
      scale: Long = 1000000000000L, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // pre-partition the edge set by dst — the inflow aggregate's key —
    // so each round's groupBy(dst) reuses the materialized partitioning
    // (zero per-round edge shuffles; ranks/degrees are node-sized and
    // broadcast). The one edge shuffle happens here, once.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().repartition(col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge set")
    // driver-side scalars (N is a count, not data): initial mass share
    // and the teleport base, both floored like the in-plan divisions
    val r0 = scale / n
    val base = r0 * (1000000L - dampPpm) / 1000000L
    val deg = e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint()
    var r = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iterations) {
      val contrib = e.join(broadcast(r.withColumnRenamed("node", "src")), "src")
        .join(broadcast(deg), "src")
        .select(col("dst").as("node"),
          expr(s"((rank * ${dampPpm}L) div 1000000L) div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint()
    }
    r.orderBy(col("rank").desc, col("node"))
  }
}

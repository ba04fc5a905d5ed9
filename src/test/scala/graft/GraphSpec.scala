package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

class GraphSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("pageRank: a symmetric cycle stays uniform") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(e).collect().map(_.getAs[Long]("rank")).toSeq
    assert(r.distinct.size === 1) // same in-/out-structure → same rank
    // mass: 3 nodes at scale/3 minus only floor dust
    assert(math.abs(r.sum - 1000000000000L) < 100)
  }

  test("pageRank: the hub of an in-star outranks the leaves") {
    // leaves all point at the hub; hub points at one leaf
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRank(e).collect()
    assert(r.head.getAs[Long]("node") === 0L) // rank-desc ordering
    val ranks = r.map(x => x.getAs[Long]("node") -> x.getAs[Long]("rank")).toMap
    assert(ranks(0L) > ranks(1L))
    assert(ranks(1L) > ranks(2L)) // hub's out-edge boosts leaf 1
    assert(ranks(2L) === ranks(3L)) // symmetric leaves tie exactly
  }

  test("pageRank is exactly reproducible across partitionings") {
    val li = Tables(spark, sf(), "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("o"),
        org.apache.spark.sql.functions.col("l_partkey").as("p"))
    import org.apache.spark.sql.functions.col
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
    val x = Graph.pageRank(e, iterations = 2).collect().map(_.toSeq).toSeq
    val y = Graph.pageRank(e.repartition(13), iterations = 2)
      .collect().map(_.toSeq).toSeq
    assert(x === y)
  }
}

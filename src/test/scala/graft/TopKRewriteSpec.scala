package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential spec for graft.plans.WindowTopKRewrite: the rewritten
  * plan must produce exactly the rows the window form produces, the
  * rewrite must actually fire (no Window in the optimized plan), and
  * non-eligible shapes must pass through untouched.
  */
class TopKRewriteSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def flag(on: Boolean): Unit =
    spark.conf.set("spark.graft.topkRewrite", on.toString)

  private def topkQuery(df: DataFrame) = {
    val w = Window.partitionBy("k").orderBy("v", "id")
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
  }

  private val data =
    (1L to 2000L).map(i => (i, i % 13, (i * 7919) % 97)).toDF("id", "k", "v")

  test("the rewrite fires: no Window left, topk_rows aggregate in its place") {
    flag(true)
    try {
      val plan = topkQuery(data).queryExecution.optimizedPlan.toString
      assert(!plan.contains("Window"), plan.take(800))
      assert(plan.contains("topk_rows"), plan.take(800))
    } finally flag(true)
  }

  test("rewritten results equal the window form bit for bit") {
    def rows(on: Boolean): Set[(Long, Long, Long, Int)] = {
      flag(on)
      try topkQuery(data).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      finally flag(true)
    }
    val rewritten = rows(true)
    val window = rows(false)
    assert(rewritten === window)
    assert(rewritten.size === 13 * 3)
    // downstream operators over the preserved attribute ids still work
    flag(true)
    val agg = topkQuery(data).groupBy("k").agg(sum("v").as("s"), max("rn").as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(agg.size === 13 && agg.values.forall(_._2 === 3))
  }

  test("rn = 1 (the latest-by-key idiom) rewrites too") {
    flag(true)
    val w = Window.partitionBy("k").orderBy("v", "id")
    val q = data.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    val got = q.select("k", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    flag(false)
    val want = try data.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).select("k", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    finally flag(true)
    assert(got === want)
  }

  test("non-eligible shapes keep their Window: desc order, rank(), no filter") {
    flag(true)
    val wDesc = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    assert(data.withColumn("rn", row_number().over(wDesc))
      .where(col("rn") <= 3)
      .queryExecution.optimizedPlan.toString.contains("Window"))
    val wAsc = Window.partitionBy("k").orderBy("v", "id")
    assert(data.withColumn("rn", rank().over(wAsc)).where(col("rn") <= 3)
      .queryExecution.optimizedPlan.toString.contains("Window"))
    assert(data.withColumn("rn", row_number().over(wAsc))
      .queryExecution.optimizedPlan.toString.contains("Window"))
  }
}

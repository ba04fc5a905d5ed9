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

  test("desc over not-null-proven integrals rewrites via the -1-x reversal") {
    flag(true)
    val wDesc = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    // the filter's IsNotNull constraint is what licenses the reversal
    val src = data.where(col("v").isNotNull)
    val q = src.withColumn("rn", row_number().over(wDesc)).where(col("rn") <= 2)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    flag(false)
    val want = try src.withColumn("rn", row_number().over(wDesc))
      .where(col("rn") <= 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    finally flag(true)
    assert(got === want && got.size === 13 * 2)
  }

  test("Long.MinValue survives the desc reversal (no negation overflow)") {
    flag(true)
    val d = Seq((1L, 0L, Long.MinValue), (2L, 0L, 0L), (3L, 0L, Long.MaxValue))
      .toDF("id", "k", "v").where(col("v").isNotNull)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = d.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    assert(!q.queryExecution.optimizedPlan.toString.contains("Window"))
    val r = q.orderBy("rn").collect().map(x => x.getLong(0) -> x.getInt(3))
    assert(r.toSeq === Seq(3L -> 1, 2L -> 2, 1L -> 3)) // max first, min last
  }

  test("non-eligible shapes keep their Window: nullable desc, rank(), no filter") {
    flag(true)
    // desc WITHOUT a not-null proof must not rewrite (null ordering
    // would flip under negation) — needs a GENUINELY nullable column:
    // toDF over Long tuples is non-nullable, which licenses the
    // reversal via the trivial IsNotNull constraint
    val nullable = (1L to 100L)
      .map(i => (i, i % 5, if (i % 9 == 0) None else Some(i % 17)))
      .toDF("id", "k", "v")
    val wDesc = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    assert(nullable.withColumn("rn", row_number().over(wDesc))
      .where(col("rn") <= 3)
      .queryExecution.optimizedPlan.toString.contains("Window"))
    // desc over DOUBLE never rewrites, proof or not (NaN breaks the
    // negation reversal)
    val dd = data.withColumn("x", col("v").cast("double") / 7)
      .where(col("x").isNotNull)
    val wD = Window.partitionBy("k").orderBy(col("x").desc, col("id"))
    assert(dd.withColumn("rn", row_number().over(wD)).where(col("rn") <= 3)
      .queryExecution.optimizedPlan.toString.contains("Window"))
    val wAsc = Window.partitionBy("k").orderBy("v", "id")
    assert(data.withColumn("rn", rank().over(wAsc)).where(col("rn") <= 3)
      .queryExecution.optimizedPlan.toString.contains("Window"))
    assert(data.withColumn("rn", row_number().over(wAsc))
      .queryExecution.optimizedPlan.toString.contains("Window"))
  }
}

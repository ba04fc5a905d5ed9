package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the TopKRows bounded top-k-per-group aggregate
  * (graft.functions.TopKRows).
  */
class TopKSpec extends AnyFunSuite with SparkSuite {

  test("topk_rows returns exactly the row_number window's rows") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sf(), "events").where(col("value").isNotNull)
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val ref = ev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "value")
      .orderBy("user_id", "rn")
      .collect()
    val tk = call_function("topk_rows",
      struct((-col("value")).as("nv"), col("event_id")), lit(3))
    val got = ev.groupBy("user_id").agg(tk.as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("user_id"), (col("i") + 1).cast("int").as("rn"),
        col("r.event_id").as("event_id"), (-col("r.nv")).as("value"))
      .orderBy("user_id", "rn")
      .collect()
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("topk_rows aggregates partially before the shuffle") {
    val tk = call_function("topk_rows",
      struct((-col("value")).as("nv"), col("event_id")), lit(3))
    val plan = Tables(spark, sf(), "events")
      .groupBy("user_id").agg(tk.as("top"))
      .queryExecution.executedPlan.toString
    // partial top-k runs map-side (ObjectHashAggregate), so the
    // exchange carries at most k rows per group per task with no sort
    // of the input (the window form's partial WindowGroupLimit sorts
    // every map partition first)
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topk_rows"))
  }

  test("topk_rows handles groups smaller than k and empty input") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
    val tk = call_function("topk_rows", struct(col("v")), lit(10))
    val rows = df.groupBy("k").agg(tk.as("top"))
      .select(col("k"), size(col("top")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows === Map("a" -> 2, "b" -> 1))
    val empty = df.where(lit(false)).groupBy("k").agg(tk.as("top")).collect()
    assert(empty.isEmpty)
  }

  test("randomized differential: topk_rows == window top-k with ties and skew") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // heavy skew (half the rows on one key) and deliberate value ties
    // to exercise heap eviction and the struct tie-break
    val rows = (1 to 2000).map { i =>
      val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(50).toLong
      (key, rnd.nextInt(20).toLong, i.toLong)
    }
    val df = rows.toDF("k", "v", "id").repartition(8)
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val ref = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("k", "rn", "v", "id").orderBy("k", "rn").collect()
    val tk = call_function("topk_rows", struct((-col("v")).as("nv"), col("id")), lit(5))
    val got = df.groupBy("k").agg(tk.as("top"))
      .select(col("k"), posexplode(col("top")).as(Seq("i", "r")))
      .select(col("k"), (col("i") + 1).cast("int").as("rn"),
        (-col("r.nv")).as("v"), col("r.id").as("id"))
      .orderBy("k", "rn").collect()
    assert(got.length === ref.length)
    got.zip(ref).foreach { case (g, r) => assert(g === r) }
  }

  test("topk_rows in SQL text (registered via extensions)") {
    val n = spark.sql(
      s"""SELECT user_id, topk_rows(struct(-value, event_id), 3) AS top
         |FROM parquet.`${sf()}/events.parquet`
         |GROUP BY user_id""".stripMargin).count()
    assert(n > 0)
  }
}

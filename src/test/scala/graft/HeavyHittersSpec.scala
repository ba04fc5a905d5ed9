package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("small-capacity sketch under heavy eviction still finds every heavy hitter") {
    // 3 heavy keys drowned in 5000 near-distinct keys; k = 64 forces
    // constant decrement-all eviction. N = 5600, threshold 200 →
    // guarantee needs k+1 > 5600/200 = 28; 64 clears it.
    val rows = (0 until 5000).map(i => 1000L + i) ++
      Seq.fill(200)(1L) ++ Seq.fill(250)(2L) ++ Seq.fill(150)(3L)
    val d = scala.util.Random.shuffle(rows).toDF("k").repartition(8)
    val r = HeavyHitters.topByCount(d, "k", minCount = 200L, k = 64)
      .collect().map(x => x.getAs[Long]("k") -> x.getAs[Long]("cnt")).toMap
    assert(r === Map(1L -> 200L, 2L -> 250L))
  }

  test("matches the exact groupBy on testdata") {
    val ev = Tables(spark, sf("sf0.01"), "events")
    val got = HeavyHitters.topByCount(ev, "user_id", minCount = 20L)
      .collect().map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("cnt"))
      .toMap
    val want = ev.where(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 20)
      .collect().map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("cnt"))
      .toMap
    assert(got === want)
  }

  test("a broken guarantee fails loud, never under-reports") {
    val d = (0 until 3000).map(_.toLong).toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topByCount(d, "k", minCount = 2L, k = 16).collect()
    }
    assert(e.getMessage.contains("guarantee"))
  }
}

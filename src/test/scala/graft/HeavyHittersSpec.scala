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

  test("count-min never underestimates; tiny width forces visible overshoot") {
    // 40 distinct tokens into w=4 buckets per row guarantees
    // collisions — every estimate must still dominate its exact count
    val docs = (0 until 40)
      .map(i => (i.toLong, Seq.fill(i % 7 + 1)(s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = HeavyHitters.countMin(docs, w = 4, d = 2, minExact = 1L)
      .collect()
    assert(r.length === 40)
    assert(r.forall(_.getAs[Long]("overshoot") >= 0L))
    assert(r.exists(_.getAs[Long]("overshoot") > 0L))
    r.foreach { x =>
      assert(x.getAs[Long]("est") ===
        x.getAs[Long]("exact") + x.getAs[Long]("overshoot"))
    }
  }

  test("count-min with ample width is exact on well-spread tokens") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = HeavyHitters.countMin(docs, w = 1024, d = 4, minExact = 1L)
      .collect().map(x => x.getAs[String]("tok") -> x.getAs[Long]("est"))
      .toMap
    assert(r === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("trendingDelta: rank shifts computed, absent-before items flagged new") {
    import org.apache.spark.sql.functions._
    // prev window: item 1×5, item 2×3; cur window: item 3×4, item 2×2,
    // item 1×1 — top-2 cur is item 3 (new) then item 2 (held rank 2)
    val rows =
      Seq.fill(5)((1L, 0L)) ++ Seq.fill(3)((2L, 0L)) ++
      Seq.fill(4)((3L, 100L)) ++ Seq.fill(2)((2L, 100L)) ++ Seq((1L, 100L))
    val d = rows.toDF("item", "day")
      .withColumn("ts", expr(
        "timestamp_micros(day * 86400000000 + 820454400000000)")) // ~1996
    val r = HeavyHitters.trendingDelta(d, "item", "ts", "1996-02-15", k = 2)
      .collect().map(x => (x.getAs[Long]("rank_cur"), x.getAs[Long]("item"),
        x.getAs[Long]("cnt_cur"), x.getAs[Long]("cnt_prev"),
        Option(x.getAs[Any]("prev_rank")), Option(x.getAs[Any]("rank_delta")),
        x.getAs[Boolean]("is_new"))).toSeq
    assert(r === Seq(
      (1L, 3L, 4L, 0L, None, None, true),
      (2L, 2L, 2L, 3L, Some(2L), Some(0L), false)))
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Par

class ParSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("globalRowNumber equals the global window, without one") {
    val ev = Tables(spark, sf(), "events")
      .where(col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val got = Par.globalRowNumber(ev, Seq("us", "event_id"), parts = 7)
      .select("event_id", "rownum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = ev.withColumn("rownum",
        row_number().over(Window.orderBy("us", "event_id")).cast("long"))
      .select("event_id", "rownum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === ref)
  }

  test("globalRowNumber is dense and stable across input partitioning") {
    val d = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "k")
    val a = Par.globalRowNumber(d, Seq("k", "id"), parts = 5)
      .select("id", "rownum").collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = Par.globalRowNumber(d.repartition(13), Seq("k", "id"), parts = 5)
      .select("id", "rownum").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toMap === b.toMap)
    // dense 1..N
    assert(a.map(_._2).sorted.toSeq === (1L to 1000L))
  }

  test("prefixSum matches the single-window reference, grouped and global") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      (i.toLong, s"g${i % 3}", (i * 2654435761L) % 100, (i % 7 + 1).toLong)
    }
    val d = rows.toDF("id", "g", "o", "v").repartition(11)
    // grouped
    val got = Par.prefixSum(d, Seq("g"), Seq("o", "id"), "v")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = rows.groupBy(_._2).values.flatMap { grp =>
      val sorted = grp.sortBy(r => (r._3, r._1))
      sorted.zip(sorted.scanLeft(0L)(_ + _._4).drop(1))
        .map { case (r, c) => r._1 -> c }
    }.toMap
    assert(got === want)
    // global (empty groupCols)
    val gotG = Par.prefixSum(d, Seq.empty, Seq("o", "id"), "v")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val sortedAll = rows.sortBy(r => (r._3, r._1))
    val wantG = sortedAll.zip(sortedAll.scanLeft(0L)(_ + _._4).drop(1))
      .map { case (r, c) => r._1 -> c }.toMap
    assert(gotG === wantG)
  }
}

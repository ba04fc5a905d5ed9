package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Analytics

class AnalyticsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("mergeCountSum(state, delta) equals the full rebuild on testdata") {
    val ev = Tables(spark, sf(), "events").where(col("ts").isNotNull)
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
    val mid = ev.agg(expr("percentile_approx(day, 0.5)")).collect()
      .head.getLong(0)
    val merged = Analytics.mergeCountSum(
        Analytics.countSumState(ev.where(col("day") < mid)),
        Analytics.countSumState(ev.where(col("day") >= mid)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Analytics.countSumState(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged === full)
  }

  test("mergeCountSum keeps keys present on only one side") {
    val a = Seq((1L, 2L, 10L), (2L, 1L, 5L)).toDF("key", "n", "sum_micro")
    val b = Seq((2L, 3L, 7L), (3L, 1L, 1L)).toDF("key", "n", "sum_micro")
    val r = Analytics.mergeCountSum(a, b).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(1L -> ((2L, 10L)), 2L -> ((4L, 12L)), 3L -> ((1L, 1L))))
  }

  test("funnel: conversion requires order and the deadline") {
    val ev = Seq(
      (1L, 7L, "view", ts(0)), (2L, 7L, "purchase", ts(30)),   // converts
      (3L, 8L, "purchase", ts(0)), (4L, 8L, "view", ts(10)),   // purchase BEFORE view → no
      (5L, 9L, "view", ts(0)),                                  // no purchase → no
      (6L, 3L, "purchase", ts(5)))                               // no view → excluded
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Analytics.funnel(ev, "view", "purchase", windowUs = 3600000000L)
      .collect().map(x => x.getAs[Long]("key") -> x.getAs[Int]("converted")).toMap
    assert(r === Map(7L -> 1, 8L -> 0, 9L -> 0))
  }

  test("funnel deadline: a second step past the window does not convert") {
    val ev = Seq((1L, 7L, "view", ts(0)), (2L, 7L, "purchase", ts(45)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Analytics.funnel(ev, "view", "purchase",
      windowUs = 1800000000L).collect() // 30-minute window, purchase at +45
    assert(r.head.getAs[Int]("converted") === 0)
    assert(r.head.getAs[java.lang.Long]("second_us") !== null)
  }

  test("retention: offsets count distinct active users per cohort day") {
    def dts(d: Int, h: Int): Timestamp = Timestamp.valueOf(f"2026-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, 7L, dts(1, 9)), (2L, 7L, dts(1, 20)), // same day twice → 1
      (3L, 7L, dts(3, 9)),                        // day offset 2
      (4L, 8L, dts(1, 1)), (5L, 8L, dts(2, 1)),  // offsets 0, 1
      (6L, 9L, dts(2, 5)))                        // cohort day 2
      .toDF("event_id", "user_id", "ts")
    val r = Analytics.retention(ev).collect()
      .map(x => (x.getAs[Long]("cohort_day"), x.getAs[Long]("day_offset")) ->
        x.getAs[Long]("n_users")).toMap
    val d1 = java.time.LocalDate.of(2026, 1, 1).toEpochDay
    assert(r === Map(
      (d1, 0L) -> 2L, (d1, 1L) -> 1L, (d1, 2L) -> 1L,
      (d1 + 1, 0L) -> 1L))
  }
}

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

  test("peakConcurrency: half-open boundaries and first-peak instant") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    // 1h intervals: starts at :00 :10 :20 overlap → peak 3 at :20;
    // a start EXACTLY at 11:00 (= :00's half-open end) must not push
    // the peak to 4 — the close nets against the open
    val ev = Seq((1L, t(0), "a"), (2L, t(10), "a"), (3L, t(20), "a"),
      (4L, java.sql.Timestamp.valueOf("2026-01-01 11:00:00"), "a"),
      (9L, t(30), "b"))
      .toDF("event_id", "ts", "event_type")
    val r = graft.ops.Temporal.peakConcurrency(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    val us2020 = java.time.Instant.parse("2026-01-01T10:20:00Z")
    assert(r("a")._1 === 3L)
    assert(r("b") === ((1L,
      java.time.Instant.parse("2026-01-01T10:30:00Z").toEpochMilli * 1000L)))
    assert(r("a")._2 === us2020.toEpochMilli * 1000L)
    // partitioning invariance: the two-pass prefix scan must not
    // depend on input layout
    val r13 = graft.ops.Temporal.peakConcurrency(ev.repartition(13))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r13 === r)
  }

  test("linearAttribution: credit sums to exactly 1e6, remainder to earliest") {
    import spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(0), 7L, "click"), (2L, t(5), 7L, "click"), (3L, t(10), 7L, "click"),
      (4L, t(30), 7L, "purchase"),
      (5L, t(1), 8L, "click"), (6L, t(2), 8L, "view")) // no purchase for 8
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = graft.ops.Analytics.linearAttribution(ev).collect()
      .map(x => x.getLong(0) -> (x.getLong(2), x.getLong(3))).toMap
    // 3 clicks share 1e6: 333333 each, remainder 1 to the earliest
    assert(r(1L) === ((1L, 333334L)))
    assert(r(2L) === ((1L, 333333L)))
    assert(r(3L) === ((1L, 333333L)))
    assert(!r.contains(5L))
    assert(r.values.map(_._2).sum === 1000000L)
  }

  test("leak-free split keeps every near-dup cluster on one side") {
    import spark.implicits._
    // near-identical pair (0, 1) must land together regardless of
    // which side the representative hashes to
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "en"),
      (1L, "the quick brown fox jumps over the lazy dog tonight", "en"),
      (2L, "completely different content with no overlap at all", "en"))
      .toDF("doc_id", "text", "lang")
    val cl = graft.ops.DocDedup.clusters(
      graft.ops.DocDedup.ngramJaccard(d, n = 3, threshold = 0.5))
    val split = d.select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("side",
        when(pmod(graft.ops.Similarity.mix31Col(col("rep")), lit(1000L)) < 800,
          "train").otherwise("test"))
      .select("doc_id", "side")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split(0L) === split(1L))
    assert(split.size === 3)
  }

  test("sourceSimilarity: identical sources read 1e6 ppm, disjoint read 0") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma", "sA"), (2L, "alpha beta gamma", "sB"),
      (3L, "delta epsilon zeta", "sC"))
      .toDF("doc_id", "text", "source")
    val r = graft.ops.DocDedup.sourceSimilarity(d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(3), x.getLong(4))).toMap
    assert(r(("sA", "sB")) === ((1000000L, 1000000L)))
    assert(r(("sA", "sC")) === ((0L, 0L)))
    assert(r(("sB", "sC")) === ((0L, 0L)))
  }

  test("intervalCoverage: overlaps merge, gaps split, exact union length") {
    import spark.implicits._
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // a: [10:00,11:00)+[10:30,11:30) merge → 1.5h; [13:00,14:00) is a
    // second island → total 2.5h, 2 islands. b: single interval.
    val ev = Seq((1L, t(10, 0), "a"), (2L, t(10, 30), "a"), (3L, t(13, 0), "a"),
      (9L, t(8, 0), "b")).toDF("event_id", "ts", "event_type")
    val r = graft.ops.Temporal.intervalCoverage(ev).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("a") === ((2L, 9000000000L))) // 2.5h in us
    assert(r("b") === ((1L, 3600000000L)))
    val r13 = graft.ops.Temporal.intervalCoverage(ev.repartition(7)).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r13 === r)
  }

  test("rateSpikes: flags only the hour that doubles its trailing mean") {
    import spark.implicits._
    // 25 hours of 4 events/hour, then one hour with 9 (> 2x mean 4)
    val rows = (0 until 25).flatMap { h =>
      (0 until 4).map(i => (h.toLong * 100 + i,
        new java.sql.Timestamp(1767225600000L + h * 3600000L + i * 1000L), "a"))
    } ++ (0 until 9).map(i => (9900L + i,
      new java.sql.Timestamp(1767225600000L + 25 * 3600000L + i * 1000L), "a"))
    val ev = rows.toDF("event_id", "ts", "event_type")
    val r = graft.ops.Analytics.rateSpikes(ev).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length === 1)
    assert(r.head._3 === 9L && r.head._4 === 96L) // 24h x 4 events
  }

  test("frequentPairs: exact support/confidence/lift, dup rows collapse") {
    // baskets: o1{1,2,3} o2{1,2} o3{1,2} o4{3}; o2 lists item 1 twice —
    // basket membership must dedup before counting
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L),
      (2L, 2L), (3L, 1L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Analytics.frequentPairs(rows, minSup = 2L).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    // only (1,2) reaches support 2: cab=3 ca=3 cb=3 N=4
    // conf both = 1e6; lift = 3·4·1e6 div 9 = 1333333
    assert(r.toSeq === Seq((1L, 2L, 3L, 3L, 3L, 1000000L, 1000000L,
      1333333L)))
  }

  test("funnelK: ordered chains with per-step windows, greedy-earliest") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val W = 100L * 1000000L // 100 s step window
    val d = Seq(
      // u1 completes: a@0 → b@50 → c@120 (each gap ≤ 100 s)
      (1L, "a", ts(0)), (1L, "b", ts(50)), (1L, "c", ts(120)),
      // u2 stalls at b: c arrives 200 s after b — outside the window
      (2L, "a", ts(0)), (2L, "b", ts(50)), (2L, "c", ts(260)),
      // u3: b precedes every a — no ordered chain past step 1
      (3L, "b", ts(0)), (3L, "a", ts(10)),
      // u4: two a's; greedy takes a@0 and still finds b@90
      (4L, "a", ts(0)), (4L, "a", ts(80)), (4L, "b", ts(90)))
      .toDF("user_id", "event_type", "ts")
    val r = graft.ops.Analytics.funnelK(d, Seq("a", "b", "c"),
        stepWindowUs = W).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getLong(2)))
    // step 1 = every user with an 'a' (u3's late 'a' counts there too)
    assert(r.toSeq === Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 1L)))
  }

  test("transitionMatrix: per-user adjacency, ppm rows, tie-broken by id") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // user 1: a→b→a ; user 2: a→b ; the (a,b) count is 3 of 3 a-exits? no:
    // user1 transitions: (a,b), (b,a); user2: (a,b) → from a: 2×b;
    // from b: 1×a. Tie case: user 3 has two rows at the SAME ts —
    // order falls back to event_id: (c id=1) → (d id=2)
    val d = Seq(
      (1L, 1L, "a", ts(1000)), (2L, 1L, "b", ts(2000)),
      (3L, 1L, "a", ts(3000)),
      (4L, 2L, "a", ts(1000)), (5L, 2L, "b", ts(2000)),
      (6L, 3L, "c", ts(5000)), (7L, 3L, "d", ts(5000)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = graft.ops.Analytics.transitionMatrix(d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r(("a", "b")) === ((2L, 2L, 1000000L)))
    assert(r(("b", "a")) === ((1L, 1L, 1000000L)))
    assert(r(("c", "d")) === ((1L, 1L, 1000000L)))
    assert(!r.contains(("d", "c")))
  }

  test("rrfFuse sums reciprocal-rank weights across lists") {
    val la = Seq((1L, 1L), (2L, 2L)).toDF("id", "rnk")
    val lb = Seq((2L, 1L), (3L, 2L)).toDF("id", "rnk")
    val r = graft.ops.Similarity.rrfFuse(Seq(la, lb)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val w1 = 1000000000L / 61L // rank 1
    val w2 = 1000000000L / 62L // rank 2
    assert(r.toSeq === Seq((2L, 2L, w1 + w2), (1L, 1L, w1), (3L, 1L, w2)))
  }

  test("rrfFuse topN caps the fused list") {
    val l = (1L to 50L).map(i => (i, i)).toDF("id", "rnk")
    assert(graft.ops.Similarity.rrfFuse(Seq(l), topN = 5).count() === 5)
  }

  test("nextEventEval: held-out hits, cold-start priors score as misses") {
    import org.apache.spark.sql.functions.to_timestamp
    // mix31 splits users 1-10 → eval(1), 11-20 → train(0). Every user
    // emits A then B; eval user 1 additionally emits C then A.
    val base = (1L to 20L).flatMap(u =>
      Seq((u * 100L, u, "A", 1L), (u * 100L + 1L, u, "B", 2L)))
    val extra = Seq((9001L, 1L, "C", 3L), (9002L, 1L, "A", 4L))
    val d = (base ++ extra).toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("sec")).as("ts"))
    val r = graft.ops.Analytics.nextEventEval(d).collect()
      .map(x => (x.getAs[String]("from_type"), x.getAs[Long]("n_eval"),
        x.getAs[Long]("hit1"), x.getAs[Long]("hit3"),
        x.getAs[Long]("hit1_ppm"))).toSeq
    // A→B trained on users 11-20; eval users' A→B all hit@1. User 1's
    // B→C and C→A probe transitions absent from train: misses at
    // every k (B only ever precedes C in eval; C never trains at all)
    assert(r === Seq(("A", 10L, 10L, 10L, 1000000L),
      ("B", 1L, 0L, 0L, 0L), ("C", 1L, 0L, 0L, 0L)))
  }

  test("abcClasses: 70/90 cumulative cuts with exact decimal revenue") {
    val li = Seq((1L, 70.0, 0.0), (2L, 20.0, 0.0), (3L, 6.0, 0.0),
      (4L, 4.0, 0.0)).toDF("l_partkey", "l_extendedprice", "l_discount")
    val r = graft.ops.Analytics.abcClasses(li).collect()
      .map(x => x.getAs[String]("cls") ->
        (x.getAs[Long]("n_parts"), x.getAs[Long]("rev_micro_total"),
          x.getAs[Long]("share_ppm"))).toMap
    // cum 70 → A (≤70%), 90 → B (≤90%), 96 and 100 → C
    assert(r("A") === ((1L, 70000000L, 700000L)))
    assert(r("B") === ((1L, 20000000L, 200000L)))
    assert(r("C") === ((2L, 10000000L, 100000L)))
  }

  test("deltaAttribution: signed contributions and share shifts, exact") {
    import org.apache.spark.sql.functions._
    // span us 0..9 → split 5. A: prev {0,1,2}, cur {6};
    // B: prev {3}, cur {5,7,8,9,9}. Overall delta = 6 − 4 = +2.
    val rows = Seq(("A", 0L), ("A", 1L), ("A", 2L), ("A", 6L),
      ("B", 3L), ("B", 5L), ("B", 7L), ("B", 8L), ("B", 9L), ("B", 9L))
    val d = rows.toDF("t", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val r = graft.ops.Analytics.deltaAttribution(d, Seq("t" -> col("t")))
      .collect().map(x => x.getAs[String]("value") ->
        (x.getAs[Long]("prev_cnt"), x.getAs[Long]("cur_cnt"),
          x.getAs[Long]("delta"), x.getAs[Long]("contrib_ppm"),
          x.getAs[Long]("share_shift_ppm"))).toMap
    assert(r("A") === ((3L, 1L, -2L, -1000000L, -583334L)))
    assert(r("B") === ((1L, 5L, 4L, 2000000L, 583333L)))
  }

  test("burnRate: pages only when both windows burn above budget") {
    import org.apache.spark.sql.functions._
    // day 0: 3 errors / 10 (30%); day 1: 0 / 10 — trailing 7d on
    // day 1 is 3/20 = 15%
    val rows = Seq.fill(3)(("error", 0L)) ++ Seq.fill(7)(("view", 0L)) ++
      Seq.fill(10)(("view", 1L))
    val d = rows.toDF("event_type", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
    val r = graft.ops.Analytics.burnRate(d, budgetPpm = 200000L).collect()
      .map(x => x.getAs[Long]("day") ->
        (x.getAs[Long]("ratio_1d_ppm"), x.getAs[Long]("ratio_7d_ppm"),
          x.getAs[Boolean]("page"))).toMap
    assert(r(0L) === ((300000L, 300000L, true)))
    assert(r(1L) === ((0L, 150000L, false)))
  }

  test("conversionLatency: nearest-rank percentiles over converted delays") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 4L).flatMap(u =>
      Seq(("view", u, u * 1000000L), ("purchase", u, u * 1000000L + u * 10L)))
    val d = rows.toDF("event_type", "user_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val r = graft.ops.Analytics.conversionLatency(d, "view", "purchase")
      .collect().head
    // delays 10,20,30,40: p50 → rank 2 (20), p90/p99 → rank 4 (40)
    assert(r.getAs[Long]("n_converted") === 4L)
    assert(r.getAs[Long]("p50_us") === 20L)
    assert(r.getAs[Long]("p90_us") === 40L)
    assert(r.getAs[Long]("p99_us") === 40L)
  }

  test("survivalCurve: censored users leave the risk set without churning") {
    import org.apache.spark.sql.functions._
    // day-indexed events; corpus edge = day 10, censor horizon 3 days:
    // A (days 0-2, L=2) and B (day 0, L=0) churn; C (0-10) and
    // D (9-10) are still active at the edge → censored
    val rows = Seq(("A", 0L), ("A", 2L), ("B", 0L), ("C", 0L), ("C", 10L),
      ("D", 9L), ("D", 10L))
    val d = rows.toDF("user_id", "day")
      .withColumn("ts", expr("timestamp_micros(day * 86400000000)"))
    val r = graft.ops.Analytics.survivalCurve(d, censorDays = 3L).collect()
      .map(x => (x.getAs[Long]("t"), x.getAs[Long]("n_risk"),
        x.getAs[Long]("d_churn"), x.getAs[Long]("s_ppm"))).toSeq
    // t=0: 4 at risk, B churns → 750000; t=1: D censored (no churn,
    // S unchanged); t=2: A churns with 2 at risk → 375000; t=10: C
    // censored, curve flat
    assert(r === Seq((0L, 4L, 1L, 750000L), (1L, 3L, 0L, 750000L),
      (2L, 2L, 1L, 375000L), (10L, 1L, 0L, 375000L)))
  }

  test("spikeDrilldown: finds the planted spike hour and its driver") {
    // type x: hours 0-2 are 2/hour (user 9), hour 3 bursts to 10
    // (user 7 ×8, user 8 ×2); type y idles at 1/hour
    val rows =
      (0 until 3).flatMap(h => Seq.fill(2)(("x", 9L, h.toLong))) ++
      Seq.fill(8)(("x", 7L, 3L)) ++ Seq.fill(2)(("x", 8L, 3L)) ++
      (0 until 4).map(h => ("y", 1L, h.toLong))
    val d = rows.toDF("event_type", "user_id", "hh")
      .withColumn("ts", expr("timestamp_micros(hh * 3600000000)"))
    val r = graft.ops.Analytics.spikeDrilldown(d).collect()
    assert(r.length === 2)
    val top = r.head
    assert(top.getAs[String]("event_type") === "x")
    assert(top.getAs[Long]("hour_start_us") === 3L * 3600000000L)
    assert(top.getAs[Long]("spike_cnt") === 10L)
    assert(top.getAs[Long]("user_id") === 7L)
    assert(top.getAs[Long]("in_spike_share_ppm") === 800000L)
    assert(top.getAs[Long]("baseline_share_ppm") === 500000L)
    assert(r(1).getAs[Long]("user_id") === 8L)
    assert(r(1).getAs[Long]("in_spike_share_ppm") === 200000L)
  }

  test("topKOther: tail rolls up with merge count, exact shares") {
    val rows = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d") ++ Seq("e")
    val r = graft.ops.Analytics.topKOther(rows.toDF("cat"), "cat", k = 2)
      .collect()
      .map(x => (x.getAs[String]("category"), x.getAs[Long]("cnt"),
        x.getAs[Long]("n_merged"), x.getAs[Long]("share_ppm")))
    // ordered by count desc: the rolled-up tail (6) outweighs a (5)
    assert(r.toSeq === Seq(("other", 6L, 3L, 400000L),
      ("a", 5L, 1L, 333333L), ("b", 4L, 1L, 266666L)))
    // no tail when k covers everything → no 'other' row
    val all = graft.ops.Analytics.topKOther(rows.toDF("cat"), "cat", k = 5)
      .collect().map(_.getAs[String]("category"))
    assert(!all.contains("other") && all.length === 5)
  }

  test("frequentTriples: anti-monotone prune, exact support + confidence") {
    // orders 1-5 buy {a,b,c}; order 6 buys {a,b,d} — only (a,b,c)
    // survives minSup 3, extended from the frequent (a,b) pair
    // (support 6) → confidence 5/6
    val rows = (1L to 5L).flatMap(o => Seq((o, "a"), (o, "b"), (o, "c"))) ++
      Seq((6L, "a"), (6L, "b"), (6L, "d"))
    val d = rows.toDF("l_orderkey", "item")
    val r = graft.ops.Analytics.frequentTriples(d, itemCol = "item")
      .collect()
    assert(r.length === 1)
    val t = r.head
    assert((t.getString(0), t.getString(1), t.getString(2),
      t.getAs[Long]("support"), t.getAs[Long]("conf_ext_ppm")) ===
      (("a", "b", "c", 5L, 833333L)))
  }

  test("dailyActiveUsers: new vs returning split, cumulative curve") {
    val d = Seq((1L, 0L), (1L, 1L), (2L, 0L), (3L, 1L), (1L, 0L))
      .toDF("user_id", "d")
      .withColumn("ts", expr("timestamp_micros(d * 86400000000)"))
    val r = graft.ops.Analytics.dailyActiveUsers(d).collect()
      .map(x => (x.getAs[Long]("day"), x.getAs[Long]("n_active"),
        x.getAs[Long]("n_new"), x.getAs[Long]("n_returning"),
        x.getAs[Long]("cum_users"))).toSeq
    assert(r === Seq((0L, 2L, 2L, 0L, 2L), (1L, 2L, 1L, 1L, 3L)))
  }

  test("frequentSequences: trigram counts with distinct-user support") {
    // user 1 loops A→B→C twice (4 trigrams, ABC twice); user 2 runs
    // it once — ABC totals 3 occurrences but only 2 users, so the
    // support column exposes the looping user
    val d = (Seq("A", "B", "C", "A", "B", "C").zipWithIndex
        .map { case (t, i) => (1L, t, i.toLong) } ++
      Seq("A", "B", "C").zipWithIndex
        .map { case (t, i) => (2L, t, (10 + i).toLong) })
      .zipWithIndex.map { case ((u, t, s), id) => (id.toLong, u, t, s) }
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", expr("timestamp_micros(s * 1000000)"))
    val r = graft.ops.Analytics.frequentSequences(d).collect()
      .map(x => (x.getAs[String]("e1"), x.getAs[String]("e2"),
        x.getAs[String]("e3"), x.getAs[Long]("cnt"),
        x.getAs[Long]("n_users")))
    assert(r.length === 3)
    assert(r.head === ("A", "B", "C", 3L, 2L))
    assert(r.toSet.contains(("B", "C", "A", 1L, 1L)))
    assert(r.toSet.contains(("C", "A", "B", 1L, 1L)))
  }

  test("sequentialPairSupport counts strictly-ordered containment with gaps") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // u1: A at 10, C at 20, B at 30 → A→C, A→B, C→B (gap over C counts)
    // u2: B at 10, A at 20           → B→A only (A NOT before B)
    // u3: A and B both at 10         → ties are NOT "before" (strict <)
    val ev = Seq((1L, "A", t(10)), (1L, "C", t(20)), (1L, "B", t(30)),
      (2L, "B", t(10)), (2L, "A", t(20)),
      (3L, "A", t(10)), (3L, "B", t(10)))
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.sequentialPairSupport(ev).collect()
      .map(x => (x.getAs[String]("first_type"), x.getAs[String]("then_type"))
        -> (x.getAs[Long]("support_users"), x.getAs[Long]("support_ppm")))
      .toMap
    assert(r(("A", "B")) === (1L, 333333L)) // u1 only, of 3 users
    assert(r(("A", "C")) === (1L, 333333L))
    assert(r(("C", "B")) === (1L, 333333L))
    assert(r(("B", "A")) === (1L, 333333L)) // u2
    assert(!r.contains(("B", "C"))) // nobody has B before C
  }

  test("revenueBridge decomposes the delta and the identity holds") {
    def d(y: Int, m: Int) = java.sql.Timestamp.valueOf(
      f"$y-$m%02d-15 00:00:00")
    // month 1→2: c1 grows 100→150 (expansion 50), c2 shrinks 80→30
    // (contraction 50), c3 churns 60→0, c4 is new at 40
    val o = Seq(
      (1L, d(2024, 1), 100.0), (1L, d(2024, 2), 150.0),
      (2L, d(2024, 1), 80.0), (2L, d(2024, 2), 30.0),
      (3L, d(2024, 1), 60.0),
      (4L, d(2024, 2), 40.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Analytics.revenueBridge(o).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[Long]("starting_c") === 24000L)
    assert(x.getAs[Long]("new_c") === 4000L)
    assert(x.getAs[Long]("expansion_c") === 5000L)
    assert(x.getAs[Long]("contraction_c") === 5000L)
    assert(x.getAs[Long]("churned_c") === 6000L)
    assert(x.getAs[Long]("ending_c") ===
      x.getAs[Long]("starting_c") + x.getAs[Long]("new_c") +
        x.getAs[Long]("expansion_c") - x.getAs[Long]("contraction_c") -
        x.getAs[Long]("churned_c"))
  }

  test("ltvCurve right-censors late cohorts out of the denominator") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400 * 1000)
    // u1 starts day 0 (horizon 2), u2 starts day 2 (horizon 0):
    // at age 0 both are observable, at ages 1-2 only u1 is
    val ev = Seq((1L, t(0), 10.0), (1L, t(1), 10.0), (1L, t(2), 10.0),
      (2L, t(2), 100.0))
      .toDF("user_id", "ts", "value")
    val r = Analytics.ltvCurve(ev).collect()
      .map(x => x.getAs[Long]("age") ->
        (x.getAs[Long]("at_risk"), x.getAs[Long]("cum_rev_c"),
          x.getAs[Long]("ltv_milli"))).toMap
    assert(r(0L) === (2L, 11000L, 5500000L)) // (1000+10000)·1000/2
    assert(r(1L) === (1L, 12000L, 12000000L))
    assert(r(2L) === (1L, 13000L, 13000000L))
  }

  test("rfmSegments: five clean quintiles land their champions") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400 * 1000)
    // 5 users, user u has u events on day u spending 10·u — every
    // metric ranks users identically, so each lands in its own
    // (k,k,k) diagonal segment and user 5 is the champion
    val ev = (1 to 5).flatMap(u => (1 to u).map(i =>
      (u.toLong, t(u), 10.0 * u)))
      .toDF("user_id", "ts", "value")
    val r = Analytics.rfmSegments(ev).collect()
      .map(x => (x.getAs[Int]("r_score"), x.getAs[Int]("f_score"),
        x.getAs[Int]("m_score")) ->
        (x.getAs[Long]("n_users"), x.getAs[Boolean]("champion")))
      .toMap
    assert(r.size === 5)
    (1 to 5).foreach(k =>
      assert(r((k, k, k)) === (1L, k == 5), s"segment $k"))
  }

  test("activityStreaks finds the longest island per user") {
    def t(day: Long) = new java.sql.Timestamp(day * 86400 * 1000)
    // u1: days 1,2,3 then 7,8 → best streak 3 from day 1
    // u2: days 2,4,6 → best streak 1 from day 2 (earliest tie)
    val ev = (Seq(1L, 2L, 3L, 7L, 8L).map(d => (1L, t(d))) ++
      Seq(2L, 4L, 6L).map(d => (2L, t(d))))
      .toDF("user_id", "ts")
    val r = Analytics.activityStreaks(ev).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("streak_days"), x.getAs[Long]("streak_start_day")))
      .toMap
    assert(r(1L) === (3L, 1L))
    assert(r(2L) === (1L, 2L))
  }

  test("stationaryDistribution converges to the 2-state closed form") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // one user alternating A,B,A,B,...,A (20 events): transitions
    // A→B ×10, B→A ×9 — both rows deterministic (p=1e6), so the
    // chain just swaps mass and every sweep keeps the uniform vector
    val ev = (0 until 20).map(i =>
      (i.toLong, 1L, if (i % 2 == 0) "A" else "B", t(i)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Analytics.stationaryDistribution(ev).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("stationary_ppm"), x.getAs[Long]("empirical_ppm")))
      .toMap
    assert(r("A")._1 === 500000L)
    assert(r("B")._1 === 500000L)
    assert(r("A")._2 === 500000L) // 10 of 20
  }
}

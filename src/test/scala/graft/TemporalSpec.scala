package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

class TemporalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("asof join picks the latest right row at-or-before each left row") {
    val left = Seq((1L, 100L, ts(10)), (2L, 100L, ts(30)), (3L, 200L, ts(20)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), "a"), (100L, ts(20), "b"), (100L, ts(40), "c"),
      (300L, ts(1), "z"))
      .toDF("user_id", "ts", "tag")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", Seq("tag"))
      .orderBy("event_id").collect()
    assert(r.map(_.getAs[String]("tag_r")).toSeq === Seq("a", "b", null))
  }

  test("asof join: NULL keys never match NULL keys (join semantics)") {
    val left = Seq((1L, Option.empty[Long], ts(10)), (2L, Option(100L), ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((Option.empty[Long], ts(5), "nullside"), (Option(100L), ts(5), "a"))
      .toDF("user_id", "ts", "tag")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", Seq("tag"))
      .orderBy("event_id").collect()
    // the null-key left row must NOT pick up the null-key right row
    assert(r.map(_.getAs[String]("tag_r")).toSeq === Seq(null, "a"))
  }

  test("asof join: NULL in the matched right row stays NULL (no back-fill)") {
    val left = Seq((1L, 100L, ts(20))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(5), Option("old")), (100L, ts(10), Option.empty[String]))
      .toDF("user_id", "ts", "tag")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", Seq("tag")).collect()
    // matched row is ts(10) with tag NULL — a per-column carry would
    // wrongly resurrect "old" from ts(5)
    assert(r.head.getAs[String]("tag_r") === null)
  }

  test("asof join is inclusive at equal timestamps") {
    val left = Seq((1L, 100L, ts(20))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts(20), "same")).toDF("user_id", "ts", "tag")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", Seq("tag")).collect()
    assert(r.head.getAs[String]("tag_r") === "same")
  }

  test("asof join matches a naive reference implementation on random data") {
    val rnd = new scala.util.Random(42)
    val leftRows = (1L to 60L).map(i =>
      (i, (rnd.nextInt(5) + 1).toLong, ts(rnd.nextInt(59) + 1)))
    val rightRows = (1L to 40L).map(i =>
      (100L + i, (rnd.nextInt(6) + 1).toLong, ts(rnd.nextInt(59) + 1)))
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.map { case (id, u, t) => (u, t, id) }.toDF("user_id", "ts", "rid")

    val got = graft.ops.Temporal.asofJoin(left, right, "user_id", "ts", Seq("rid"))
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[java.lang.Long]("rid_r")).map(_.toLong)).toMap
    // naive: for each left row, max-ts right row with same key, ts<=lts
    // (ties impossible here per (user, ts) uniqueness of the generator? not guaranteed —
    // tie-break by the same ordering the window uses: later union order = higher rid wins is
    // NOT defined, so skip left rows whose best-ts has duplicates)
    leftRows.foreach { case (eid, u, lts) =>
      val cands = rightRows.filter(r => r._2 == u && !r._3.after(lts))
      if (cands.isEmpty) assert(got(eid).isEmpty, s"event $eid")
      else {
        val bestTs = cands.map(_._3.getTime).max
        val best = cands.filter(_._3.getTime == bestTs)
        if (best.size == 1) assert(got(eid).contains(best.head._1), s"event $eid")
      }
    }
  }

  test("nearestJoin picks the closer side, ties to the past, null on no match") {
    val left = Seq((1L, 7L, ts(10)), (2L, 7L, ts(20)), (3L, 8L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 7L, ts(7), "past3"),    // 3 before left 1
      (101L, 7L, ts(12), "fut2"),    // 2 after  left 1 → closer
      (102L, 7L, ts(17), "past3b"),  // 3 before left 2
      (103L, 7L, ts(23), "fut3"))    // 3 after  left 2 → TIE → past wins
      .toDF("click_id", "user_id", "ts", "tag")
    val r = graft.ops.Temporal.nearestJoin(left, right, "user_id", "ts",
        Seq("click_id", "tag"), rTieCol = "click_id")
      .orderBy("event_id").collect()
      .map(x => (x.getAs[Long]("event_id"), x.getAs[String]("tag_n"),
        Option(x.getAs[java.lang.Long]("nearest_dt_us")).map(_.toLong)))
    assert(r.toSeq === Seq(
      (1L, "fut2", Some(2L * 60 * 1000000)),
      (2L, "past3b", Some(-3L * 60 * 1000000)),
      (3L, null, None))) // user 8 has no clicks at all
  }

  test("nearestJoin: duplicate-timestamp rights break ties deterministically") {
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 7L, ts(8), "a"), (101L, 7L, ts(8), "b"))
      .toDF("click_id", "user_id", "ts", "tag")
    val r = graft.ops.Temporal.nearestJoin(left, right, "user_id", "ts",
        Seq("click_id", "tag"), rTieCol = "click_id").head()
    // backward carry: LARGEST id among equal timestamps wins
    assert(r.getAs[Long]("click_id_n") === 101L)
  }

  test("latestByKey keeps the newest row per key, id-tie-broken") {
    val d = Seq(
      (1L, 100L, "click", ts(10)),
      (2L, 100L, "click", ts(30)),   // newest for (100, click)
      (3L, 100L, "click", ts(30)),   // same ts — higher id wins
      (4L, 100L, "error", ts(5)),
      (5L, 200L, "click", ts(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Temporal.latestByKey(d, Seq("user_id", "event_type"))
      .orderBy("user_id", "event_type").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("event_type"),
        x.getAs[Long]("event_id")))
    assert(r.toSeq === Seq((100L, "click", 3L), (100L, "error", 4L),
      (200L, "click", 5L)))
  }

  test("scd2Build collapses runs, chains intervals, marks the open one") {
    val d = Seq(
      (1L, 7L, "free", ts(0)),
      (2L, 7L, "free", ts(5)),   // duplicate state → collapses into run
      (3L, 7L, "pro", ts(10)),
      (4L, 7L, "free", ts(20)),  // back to free = a NEW interval
      (5L, 8L, "pro", ts(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Temporal.scd2Build(d).collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[String]("state"),
        x.getAs[Long]("eff_from"),
        Option(x.getAs[java.lang.Long]("eff_to")).map(_.toLong),
        x.getAs[Boolean]("is_current")))
    def us(m: Int): Long = ts(m).getTime * 1000L
    assert(r.toSeq === Seq(
      (7L, "free", us(0), Some(us(10)), false),
      (7L, "pro", us(10), Some(us(20)), false),
      (7L, "free", us(20), None, true),
      (8L, "pro", us(1), None, true)))
  }

  test("scd2Build: equal timestamps order by id (stable interval chain)") {
    val d = Seq(
      (2L, 7L, "b", ts(0)),  // same ts — id 1 then 2
      (1L, 7L, "a", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Temporal.scd2Build(d).collect().map(_.getAs[String]("state"))
    assert(r.toSeq === Seq("a", "b"))
  }

  test("sessionize splits on gaps and counts events") {
    val ev = Seq((7L, ts(0)), (7L, ts(10)), (7L, ts(12)),
      (7L, ts(50)), (7L, ts(55)), (9L, ts(0)))
      .toDF("user_id", "ts")
    // 30-minute gap
    val r = Temporal.sessionize(ev, "user_id", "ts", 1800000000L).collect()
    val u7 = r.filter(_.getAs[Long]("key") == 7L)
    assert(u7.map(x => (x.getAs[Long]("session_id"), x.getAs[Long]("n_events"))).toSeq ===
      Seq((1L, 3L), (2L, 2L)))
    assert(r.count(_.getAs[Long]("key") == 9L) === 1)
  }

  test("ewmaMicro folds history in (ts, tie) order with integer halving") {
    val ev = Seq(
      (2L, 7L, ts(10), 3.0),   // second: (1_000_000 >> 1) + 3_000_000
      (1L, 7L, ts(5), 1.0),    // first (earlier ts despite higher row pos)
      (3L, 7L, ts(10), 2.0),   // same ts as id 2 — tie-break on event_id
      (4L, 9L, ts(1), 0.5))
      .toDF("event_id", "user_id", "ts", "value")
    val r = Temporal.ewmaMicro(ev).collect()
      .map(x => x.getAs[Long]("key") -> x.getAs[Long]("ewma_micro")).toMap
    // user 7: 0>>1+1e6 = 1e6; >>1 + 3e6 = 3.5e6; >>1 + 2e6 = 3.75e6
    assert(r(7L) === 3750000L)
    assert(r(9L) === 500000L)
  }

  test("ewmaMicro is insensitive to input partitioning/order") {
    val ev = Tables(spark, sf(), "events").limit(2000)
    val a = Temporal.ewmaMicro(ev).collect().map(_.toSeq).toSeq
    val b = Temporal.ewmaMicro(ev.repartition(7).sortWithinPartitions("value"))
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("gapFill emits a dense hourly grid with LOCF values") {
    def hts(h: Int, m: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    val ev = Seq(
      (1L, 7L, hts(1, 30), 10.0),
      (2L, 7L, hts(1, 45), 11.0),  // bucket close for hour 1
      (3L, 7L, hts(4, 0), 40.0),   // hours 2,3 empty → carry 11.0
      (4L, 9L, hts(2, 0), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = Temporal.gapFill(ev).collect()
    val u7 = r.filter(_.getAs[Long]("key") == 7L)
      .map(x => (x.getAs[Timestamp]("bucket_ts").toString,
        x.getAs[Double]("value"), x.getAs[Int]("filled")))
    assert(u7.toSeq === Seq(
      ("2026-01-01 01:00:00.0", 11.0, 1),
      ("2026-01-01 02:00:00.0", 11.0, 0),
      ("2026-01-01 03:00:00.0", 11.0, 0),
      ("2026-01-01 04:00:00.0", 40.0, 1)))
    assert(r.count(_.getAs[Long]("key") == 9L) === 1)
  }

  test("gapFill: grid rows = span buckets; no value is ever null") {
    val ev = Tables(spark, sf(), "events")
    val r = Temporal.gapFill(ev)
    assert(r.where(org.apache.spark.sql.functions.col("value").isNull).count() === 0)
    // every key's row count equals its bucket span (dense grid)
    import org.apache.spark.sql.functions._
    val spans = ev.where(col("ts").isNotNull && col("value").isNotNull &&
        col("user_id").isNotNull)
      .groupBy(col("user_id").as("key"))
      .agg((max(expr("unix_micros(ts) div 3600000000")) -
        min(expr("unix_micros(ts) div 3600000000")) + 1).as("want"))
    val got = r.groupBy("key").count()
    val joined = spans.join(got, "key")
      .where(col("want") =!= col("count")).count()
    assert(joined === 0)
  }

  test("sessionize agrees with Spark's built-in session_window") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf(), "events")
    val ours = graft.ops.Temporal.sessionize(ev, "user_id", "ts", gapUs = 1800000000L)
      .select(col("key"), col("n_events"), col("start_us"), col("end_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val builtin = ev.where(col("ts").isNotNull)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // same gap semantics up to the open/closed boundary at an exact-gap
    // step (absent from the testdata); any diff here means one of the
    // two implementations drifted
    assert(ours === builtin)
  }

  test("latenessAudit: straggler measured against the running high-water mark") {
    // arrival order by id: ts 100s, then a 10s straggler (90s late,
    // 40s beyond a 50s watermark), then 200s
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val d = Seq((1L, "g", 100L), (2L, "g", 10L), (3L, "g", 200L))
      .toDF("event_id", "event_type", "sec")
      .select(col("event_id"), col("event_type"),
        to_timestamp(col("sec")).as("ts"))
    val r = Temporal.latenessAudit(d, delayUs = 50000000L).collect().head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_late") === 1L)
    assert(r.getAs[Long]("late_ppm") === 333333L)
    assert(r.getAs[Long]("max_late_us") === 40000000L)
  }

  test("sessionizeIncremental: gap-expired sessions close, edge sessions stay open") {
    import org.apache.spark.sql.functions._
    // key 1 sessions at [0, 10min]; key 2's single event IS the batch
    // edge (2 h) — its 30-min gap window is still running
    val ev = Seq((1L, 0L), (1L, 600000000L), (2L, 7200000000L))
      .toDF("user_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val r = graft.ops.Temporal.sessionizeIncremental(ev, "user_id", "ts",
      gapUs = 1800000000L).collect()
      .map(x => x.getAs[Long]("key") ->
        (x.getAs[Long]("n_events"), x.getAs[String]("status"))).toMap
    assert(r(1L) === ((2L, "closed")))
    assert(r(2L) === ((1L, "open")))
  }

  test("tokenBucket: burst allowed, sustained rate throttles, credit caps") {
    import org.apache.spark.sql.functions._
    // capacity 2, refill 10 s: t=0 spends 1 of 2, t=1s spends the
    // refilling remainder, t=5s finds only 5 s credit → denied,
    // t=30s hits the cap again
    val ev = Seq((1L, 0L), (2L, 1000000L), (3L, 5000000L),
      (4L, 30000000L))
      .toDF("event_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
      .withColumn("user_id", lit(7L))
    val r = graft.ops.Temporal.tokenBucket(ev, capacity = 2,
      refillUs = 10000000L).collect()
      .map(x => x.getAs[Long]("event_id") ->
        (x.getAs[Boolean]("allowed"), x.getAs[Long]("avail_us"))).toMap
    assert(r(1L) === ((true, 20000000L)))
    assert(r(2L) === ((true, 11000000L)))
    assert(r(3L) === ((false, 5000000L)))
    assert(r(4L) === ((true, 20000000L))) // capped at capacity, not 30 s
  }

  test("tokenBucket: keys throttle independently") {
    import org.apache.spark.sql.functions._
    val ev = Seq((7L, 1L, 0L), (7L, 2L, 1000L), (8L, 3L, 500L))
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val r = graft.ops.Temporal.tokenBucket(ev, capacity = 1,
      refillUs = 10000000L).collect()
      .map(x => x.getAs[Long]("event_id") -> x.getAs[Boolean]("allowed"))
      .toMap
    // each key's first event spends the single token; key 7's second
    // event 1 ms later is denied, key 8's first is untouched by key 7
    assert(r === Map(1L -> true, 2L -> false, 3L -> true))
  }
}

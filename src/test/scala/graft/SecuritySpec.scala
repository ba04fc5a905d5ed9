package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Security

class SecuritySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def t(s: Long) = new java.sql.Timestamp(s * 1000)

  test("beaconing flags the metronome, not the bursty human") {
    // beacon: user 1 fires every exactly 6h (gap bucket 1 every time);
    // human: user 2 fires at irregular gaps spread across buckets
    val beacon = (0 until 5).map(i =>
      (i.toLong, 1L, "cb", t(i * 21600L)))
    val human = Seq(0L, 400L, 30400L, 80400L, 150400L).zipWithIndex.map {
      case (s, i) => (100L + i, 2L, "cb", t(s))
    }
    val ev = (beacon ++ human)
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Security.beaconing(ev).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq === Seq(1L))
    assert(r.head.getAs[Long]("n_deltas") === 4L)
    assert(r.head.getAs[Long]("modal_hits") === 4L)
    assert(r.head.getAs[Long]("regular_ppm") === 1000000L)
    assert(r.head.getAs[Long]("modal_gap_bucket") === 1L)
  }

  test("firstSeenSpike charges pairs to their first day and flags the burst") {
    // day 0: pairs (1,a),(2,a) born; day 1: one new pair; day 2: four
    // new pairs (≥ 2× prior avg of 1.5) → spike
    val ev = Seq(
      (1L, "a", t(0)), (2L, "a", t(10)),
      (1L, "a", t(86400)), (3L, "a", t(86400 + 5)),
      (4L, "a", t(2 * 86400)), (5L, "a", t(2 * 86400 + 1)),
      (6L, "a", t(2 * 86400 + 2)), (7L, "a", t(2 * 86400 + 3)))
      .toDF("user_id", "event_type", "ts")
    val r = Security.firstSeenSpike(ev).collect()
      .map(x => x.getAs[Long]("d") ->
        (x.getAs[Long]("new_pairs"), x.getAs[Long]("cum_pairs"),
          x.getAs[Boolean]("spike"))).toMap
    assert(r(0L) === (2L, 2L, false))  // no prior days → vacuous
    assert(r(1L) === (1L, 3L, false))  // 1·1 < 2·2
    assert(r(2L) === (4L, 7L, true))   // 4·2 ≥ 3·2
  }

  test("spray fires on breadth-without-depth and stays silent on depth") {
    // hour 0: 12 users once each → spray; hour 1: one user 12 times →
    // not a spray (breadth 1, depth 12)
    val wide = (0 until 12).map(u => (u.toLong, "login_fail", t(u)))
    val deep = (0 until 12).map(i => (99L, "login_fail", t(3600 + i)))
    val ev = (wide ++ deep).toDF("user_id", "event_type", "ts")
    val r = Security.spray(ev).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("hour") === 0L)
    assert(r.head.getAs[Long]("n_users") === 12L)
    assert(r.head.getAs[Long]("max_per_user") === 1L)
  }

  test("dormantReactivation needs BOTH the gap and the burst") {
    val day = 86400L
    // u1: active, 4-day silence, then 3 events in a burst → flagged
    // u2: same silence but a single return event → no burst, silent
    // u3: steady daily activity → no qualifying gap
    val ev = (Seq((1L, 1L, t(0)), (2L, 1L, t(4 * day)),
      (3L, 1L, t(4 * day + 100)), (4L, 1L, t(5 * day))) ++
      Seq((10L, 2L, t(0)), (11L, 2L, t(4 * day))) ++
      (0 until 6).map(i => (20L + i, 3L, t(i * day))))
      .map { case (id, u, ts) => (id, u, "x", ts) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Security.dormantReactivation(ev).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq === Seq(1L))
    assert(r.head.getAs[Long]("gap_days") === 4L)
    assert(r.head.getAs[Long]("burst_events") === 3L)
    assert(r.head.getAs[Long]("react_us") === 4 * day * 1000000L)
  }

  test("rareTransitions ranks the one-off step first with breadth 1") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // everyone cycles A→B→A...; one actor makes a single A→C step
    val common = (0 until 10).flatMap(u => (0 until 6).map(i =>
      (u * 100L + i, u.toLong, if (i % 2 == 0) "A" else "B",
        t(u * 1000L + i))))
    val oddball = Seq((9901L, 99L, "A", t(500000)),
      (9902L, 99L, "C", t(500001)))
    val ev = (common ++ oddball)
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = graft.ops.Security.rareTransitions(ev).collect()
    val top = r.head
    assert((top.getAs[String]("from_type"), top.getAs[String]("to_type"))
      === ("A", "C"))
    assert(top.getAs[Long]("n_steps") === 1L)
    assert(top.getAs[Long]("n_users") === 1L)
    assert(top.getAs[Long]("example_user") === 99L)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Security-analytics operators over the event stream — the detection
  * shapes the reference's alert engine exists to serve (threshold /
  * deadman / sequence are its primitives; these are the composite
  * behavioral detections an analyst builds FROM those primitives).
  * All integer-exact with full relational oracles, same contract as
  * the rest of the registry.
  */
object Security {

  /** Beaconing detection: keys whose inter-arrival gaps cluster on one
    * modal interval — the C2-callback / cron-imposter shape (humans
    * are bursty; implants are metronomes). Per (user, type) with
    * enough events: successive deltas (total-ordered by ts, id),
    * quantized to `gapBucketUs` buckets, the modal bucket (ties →
    * smallest), and the share of deltas landing in it —
    * `regular_ppm ≥ regularPpm` with ≥ `minDeltas` gaps flags the
    * key. (On a real feed the bucket is a minute; the synthetic
    * corpus's sparse uniform cadence needs 6 h buckets to have any
    * modal mass at all — the parameter IS the knob.)
    *
    * Scale shape: ONE shuffle on the (user, type) key; the lag, the
    * bucket histogram and the modal pick are all windows inside that
    * partitioning (Spark reuses the exchange), and the histogram is
    * |keys|·|distinct gaps| — bounded by the event count, folded
    * map-side first.
    */
  def beaconing(events: DataFrame, gapBucketUs: Long = 21600000000L,
      minDeltas: Long = 3L, regularPpm: Long = 400000L,
      topN: Int = 50): DataFrame = {
    val byKey = Window.partitionBy("u", "t")
    val seq = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").as("u"), col("event_type").as("t"),
        expr("unix_micros(ts)").as("us"), col("event_id").as("id"))
      .withColumn("prev", lag(col("us"), 1).over(byKey.orderBy("us", "id")))
      .where(col("prev").isNotNull)
      .select(col("u"), col("t"),
        expr(s"(us - prev) div $gapBucketUs").as("gap_bucket"))
    // ONE scan + one (u, t) shuffle: totals fold from the histogram
    // (Σ bucket counts = delta count), not from a second pass
    val hist = seq.groupBy("u", "t", "gap_bucket")
      .agg(count(lit(1)).as("c"))
    beaconingFromHist(hist, minDeltas, regularPpm, topN)
  }

  /** The modal-share tail over an already-folded
    * (u, t, gap_bucket, c) histogram — shared by the batch op and
    * the streaming twin (whose drained state IS this histogram).
    */
  private[graft] def beaconingFromHist(hist0: DataFrame,
      minDeltas: Long = 3L, regularPpm: Long = 400000L,
      topN: Int = 50): DataFrame = {
    val byKey = Window.partitionBy("u", "t")
    val hist = hist0
      .localCheckpoint() // modal window + totals fold share it
    val modal = hist
      .withColumn("rn", row_number().over(
        byKey.orderBy(col("c").desc, col("gap_bucket"))))
      .where(col("rn") === 1)
      .select(col("u"), col("t"), col("gap_bucket").as("modal_gap_bucket"),
        col("c").as("modal_hits"))
    val totals = hist.groupBy("u", "t").agg(sum(col("c")).as("n_deltas"))
    totals.join(modal, Seq("u", "t"))
      .where(col("n_deltas") >= minDeltas)
      .withColumn("regular_ppm",
        expr("modal_hits * 1000000 div n_deltas"))
      .where(col("regular_ppm") >= regularPpm)
      .select(col("u").as("user_id"), col("t").as("event_type"),
        col("n_deltas"), col("modal_gap_bucket"), col("modal_hits"),
        col("regular_ppm"))
      .orderBy(col("regular_ppm").desc, col("user_id"), col("event_type"))
      .limit(topN)
  }

  /** First-seen novelty spikes: the day-by-day count of never-before-
    * seen (user, type) pairs, with a spike flag when a day mints at
    * least twice the average of all PRIOR days (integer cross-multiply
    * — no float mean). New-entity emergence is the classic early
    * compromise signal the pure-volume triggers miss.
    *
    * Scale shape: one (user, type) min-fold charges each pair to its
    * first day (combinable — the 100 TB scan folds to |pairs| rows);
    * everything after runs on the day-grid table.
    */
  def firstSeenSpike(events: DataFrame): DataFrame = {
    val firstDay = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .groupBy(col("user_id").as("u"), col("event_type").as("t"))
      .agg(min(expr("unix_micros(ts) div 86400000000")).as("d"))
    val daily = firstDay.groupBy("d")
      .agg(count(lit(1)).as("new_pairs"))
    val byDay = Window.orderBy("d")
    daily
      .withColumn("cum_pairs", sum(col("new_pairs")).over(byDay))
      .withColumn("prior_days",
        (count(lit(1)).over(byDay) - 1L).cast("long"))
      .withColumn("prior_sum", col("cum_pairs") - col("new_pairs"))
      // spike ⟺ new · prior_days ≥ 2 · prior_sum (vacuous on day 1)
      .withColumn("spike",
        col("prior_days") > 0 &&
          col("new_pairs") * col("prior_days") >= col("prior_sum") * 2)
      .select("d", "new_pairs", "cum_pairs", "spike")
      .orderBy("d")
  }

  /** Rare-transition audit: the `k` transitions the GLOBAL chain
    * rates lowest among those actually taken — each with its
    * probability, how many steps took it and how many distinct users
    * did (breadth 1 = one actor doing something nobody else does,
    * the interesting case). A fixed bottom-k instead of an absolute
    * threshold: "rare" is relative to THIS corpus's mix, so the
    * audit can never come back vacuously empty or uselessly full.
    *
    * Scale shape: one user-key shuffle for the lead; the matrix and
    * its per-cell user counts fold to |types|² rows; bottom-k is a
    * bounded sort on that grid.
    */
  def rareTransitions(events: DataFrame, k: Int = 5): DataFrame = {
    val byUser = Window.partitionBy("u").orderBy("us", "id")
    val t = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").as("u"), col("event_type").as("et"),
        expr("unix_micros(ts)").as("us"), col("event_id").as("id"))
    val steps = t
      .withColumn("to_type", lead(col("et"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .select(col("u"), col("et").as("from_type"), col("to_type"))
    val c = steps.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_steps"),
        countDistinct(col("u")).as("n_users"),
        min(col("u")).as("example_user"))
      .localCheckpoint() // row totals + the ranked cut share it
    c.join(
        c.groupBy("from_type").agg(sum("n_steps").as("row_total")),
        "from_type")
      .select(col("from_type"), col("to_type"), col("n_steps"),
        col("n_users"), col("example_user"),
        expr("n_steps * 1000000 div row_total").as("p_ppm"))
      .orderBy(col("p_ppm"), col("from_type"), col("to_type"))
      .limit(k)
  }

  /** Dormant-account reactivation: users whose LATEST inactivity gap
    * of at least `dormantDays` ends in a burst of `minBurst`+ events
    * within `burstWindowDays` — the account-takeover tell (stolen
    * credentials wake accounts their owners forgot). Gap detection is
    * one lag inside the per-user partitioning; the burst count joins
    * events back against each user's single reactivation instant.
    *
    * Scale shape: one (user) shuffle for the lag; the reactivation
    * table is ≤ one row per user, broadcast back onto the stream for
    * the burst count — no self-join wider than |users|.
    */
  def dormantReactivation(events: DataFrame, dormantDays: Long = 3L,
      burstWindowDays: Long = 2L, minBurst: Long = 2L): DataFrame = {
    val byUser = Window.partitionBy("u")
    val s = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").as("u"), expr("unix_micros(ts)").as("us"),
        col("event_id").as("id"))
    val d = s
      .withColumn("gap",
        col("us") - lag(col("us"), 1).over(byUser.orderBy("us", "id")))
      .where(col("gap") >= dormantDays * 86400000000L)
      .localCheckpoint() // reactivation pick + gap lookup share it
    val g = d.groupBy("u").agg(max("us").as("react_us"))
    val withGap = d.as("d").join(g.as("g"),
        col("d.u") === col("g.u") && col("d.us") === col("g.react_us"))
      .select(col("d.u").as("u"), col("g.react_us").as("react_us"),
        col("d.gap").as("gap"))
    val burst = s.join(broadcast(withGap.select(col("u"), col("react_us"))),
        Seq("u"))
      .where(col("us") >= col("react_us") &&
        col("us") < col("react_us") + burstWindowDays * 86400000000L)
      .groupBy("u").agg(count(lit(1)).as("burst_events"))
    withGap.join(burst, "u")
      .where(col("burst_events") >= minBurst)
      .select(col("u").as("user_id"), col("react_us"),
        expr("gap div 86400000000").as("gap_days"), col("burst_events"))
      .orderBy("user_id")
  }

  /** Password-spray shape: hours where one event type touches MANY
    * distinct users but no user more than a couple of times — the
    * low-and-slow inverse of a brute force (per-user thresholds stay
    * silent by design; the breadth is the signal). Exact counts per
    * (type, hour); flag when `n_users ≥ minUsers` and
    * `max_per_user ≤ maxPerUser`.
    *
    * Scale shape: one combinable (type, hour, user) count, then a
    * (type, hour) fold carrying count-distinct-by-construction (the
    * inner groupBy already dedups users) and a max — no
    * count_distinct shuffle on the raw stream.
    */
  def spray(events: DataFrame, minUsers: Long = 10L,
      maxPerUser: Long = 2L): DataFrame = {
    val perUser = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .groupBy(col("event_type").as("t"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        col("user_id").as("u"))
      .agg(count(lit(1)).as("c"))
    sprayFromPerUser(perUser, minUsers, maxPerUser)
  }

  /** The breadth-without-depth tail over an already-folded
    * (t, h, u, c) table — shared by the batch op and the streaming
    * twin (whose drained state IS this table).
    */
  private[graft] def sprayFromPerUser(perUser: DataFrame,
      minUsers: Long = 10L, maxPerUser: Long = 2L): DataFrame =
    perUser.groupBy("t", "h")
      .agg(count(lit(1)).as("n_users"), sum(col("c")).as("n_events"),
        max(col("c")).as("max_per_user"))
      .where(col("n_users") >= minUsers &&
        col("max_per_user") <= maxPerUser)
      .select(col("t").as("event_type"), col("h").as("hour"),
        col("n_users"), col("n_events"), col("max_per_user"))
      .orderBy("event_type", "hour")
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal operators Spark lacks natively, composed from built-ins
  * (preference (a) of the custom-operator ladder — no custom physical
  * operator needed, and the composition keeps Catalyst fully in
  * charge of the shuffle plan).
  */
object Temporal {

  /** Latest-version compaction (the CDC/upsert read view): keep each
    * key's newest row by event time, ties broken by the id column —
    * the "current state" materialization every mutable-source mirror
    * (user profiles, device inventory, doc revisions) compacts to
    * before analytics run.
    *
    * ONE shuffle keyed by the key columns; the max_by-shaped window
    * never sorts more than a key's own rows. At lake scale this is the
    * nightly compaction job — pair with [[graft.sources.Lake]] to
    * rewrite the view hive-partitioned.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    // rank column name chosen to not collide with any input column —
    // a fixed "__rn" would silently clobber (then drop) a caller's
    // same-named data column
    val rn = Iterator.from(0).map(i => s"__graft_rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
  }

  /** Slowly-changing-dimension type-2 build: collapse a per-key event
    * stream into validity intervals — one row per STATE CHANGE,
    * carrying `[eff_from, eff_to)` epoch-micros bounds (open current
    * interval → null `eff_to`, `is_current` true). The dimension-table
    * construction every warehouse does to make "what was this user's
    * state at time t" a plain [[intervalJoin]]/[[asofJoin]] instead of
    * a scan-back — and the inverse of [[latestByKey]], which keeps
    * only the last interval.
    *
    * Change detection is `state ≠ lag(state)` over the deterministic
    * `(ts, id)` order (ties broken by id, so duplicate-timestamp
    * events produce a stable interval chain); `eff_to` is the NEXT
    * change's `eff_from` via lead over the surviving rows. Two window
    * passes over ONE key shuffle — the partitioning from the lag pass
    * is reused by the lead pass (same key), nothing global.
    */
  def scd2Build(events: DataFrame, keyCol: String = "user_id",
      stateCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val changes = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .select(col(keyCol), col(stateCol),
        unix_micros(col(tsCol)).as("eff_from"), col(idCol))
      .withColumn("prev", lag(col(stateCol), 1).over(
        Window.partitionBy(keyCol).orderBy(col("eff_from"), col(idCol))))
      .where(col("prev").isNull || col("prev") =!= col(stateCol))
    val w2 = Window.partitionBy(keyCol).orderBy(col("eff_from"), col(idCol))
    changes
      .withColumn("eff_to", lead(col("eff_from"), 1).over(w2))
      .select(col(keyCol), col(stateCol).as("state"),
        col("eff_from"), col("eff_to"),
        col("eff_to").isNull.as("is_current"))
      .orderBy(keyCol, "eff_from")
  }

  /** As-of join: each left row picks the latest right row with the
    * same key and right ts <= left ts (point-in-time enrichment — the
    * lookup that makes training-data features leak-free).
    *
    * Implementation: tag and union both sides, then one window pass
    * per key carrying the last-seen right payload forward in event
    * time (right sorts before left at equal ts → inclusive semantics,
    * matching DuckDB's `ASOF JOIN ON l.ts >= r.ts`). ONE shuffle on
    * the key — the same cost as a plain join, no range explosion, skew
    * bounded by key cardinality.
    *
    * @param rightCols right-side payload columns to carry (appended
    *                  with `suffix`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], suffix: String = "_r"): DataFrame = {
    val leftStruct = struct(left.columns.map(col): _*)
    val leftType = StructType(left.schema.fields)
    val rightType = StructType(rightCols.map(c => right.schema(c)))
    val l2 = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    // join semantics on the key: NULL never matches NULL (the window
    // partition would otherwise lump all null keys together and carry
    // across them) — null-key right rows can never be picked, null-key
    // left rows keep flowing with null payload
    val r2 = right.where(col(keyCol).isNotNull).select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE carried struct, not one last() per column: independent
    // per-column carries would back-fill a NULL in the matched right
    // row from an older row, mixing columns of different right rows
    val carried = last(col("__r"), ignoreNulls = true).over(w).as("__rc")
    l2.unionByName(r2)
      .select(col("__side"), col("__l"), carried)
      .where(col("__side") === 1)
      .select(col("__l.*") +: rightCols.map(c => col(s"__rc.$c").as(c + suffix)): _*)
  }

  /** Nearest-event join: each left row picks the single right row of
    * the same key CLOSEST in event time — either direction, ties
    * toward the past ([[asofJoin]] is the leak-free training-feature
    * lookup; this is the measurement-alignment join sensor and
    * attribution pipelines need, where "just after" is as good as
    * "just before").
    *
    * One key shuffle, two window passes over the same partitioning:
    * a backward carry (last right at-or-before, equal timestamps
    * count as past) and a forward probe (first right strictly after),
    * then an arithmetic pick of the closer. Tie-break within equal
    * right timestamps is by `rTieCol` — largest wins backward,
    * smallest forward — making the join deterministic even on
    * duplicate-timestamp feeds.
    *
    * Output: left columns + `rightCols` suffixed + `nearest_dt_us`
    * (right minus left, negative = past; null = keyless left row or
    * no right rows for the key).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String], rTieCol: String = "event_id",
      suffix: String = "_n"): DataFrame = {
    val leftType = StructType(left.schema.fields)
    val rightType = StructType(
      org.apache.spark.sql.types.StructField("us",
        org.apache.spark.sql.types.LongType) +:
        rightCols.map(c => right.schema(c)))
    val l2 = left.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__us"), lit(1).as("__side"),
      lit(Long.MaxValue).as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r2 = right.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), unix_micros(col(tsCol)).as("__us"),
        lit(0).as("__side"), col(rTieCol).cast("long").as("__tie"),
        lit(null).cast(leftType).as("__l"),
        struct((unix_micros(col(tsCol)).as("us") +:
          rightCols.map(col)): _*).as("__r"))
    val ord = Seq(col("__us"), col("__side"), col("__tie"))
    val wb = Window.partitionBy("__k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("__k").orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val picked = l2.unionByName(r2)
      .withColumn("__rb", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__rf", first(col("__r"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)
      // equal-ts right rows sort BEFORE the left row, so they land in
      // the backward carry and the forward probe is strictly-after —
      // the `<=` pick then means ties go to the past
      .withColumn("__rn",
        when(col("__rb").isNull, col("__rf"))
          .when(col("__rf").isNull, col("__rb"))
          .when(col("__us") - col("__rb.us") <= col("__rf.us") - col("__us"),
            col("__rb"))
          .otherwise(col("__rf")))
    picked.select(
      (col("__l.*") +:
        rightCols.map(c => col(s"__rn.$c").as(c + suffix))) :+
        (col("__rn.us") - col("__us")).as("nearest_dt_us"): _*)
  }

  /** Interval (range) join: for each left row, right rows of the same
    * key within ±tolerance of its timestamp. The key equality makes
    * this a hash join with a residual range predicate — no nested-loop
    * explosion; skew follows key cardinality like any equi-join.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lTs: String, rTs: String, toleranceUs: Long,
      suffix: String = "_r"): DataFrame = {
    val l = left.select(col("*"), unix_micros(col(lTs)).as("__lus"))
    val r = right.select(col(keyCol).as("__rk"), unix_micros(col(rTs)).as("__rus"))
    l.join(r,
        l(keyCol) === r("__rk") &&
          r("__rus") >= l("__lus") - toleranceUs &&
          r("__rus") <= l("__lus") + toleranceUs)
      // matched right timestamp surfaces as a documented column; the
      // internal epoch-micros helpers never leak
      .withColumn(rTs + suffix, timestamp_micros(col("__rus")))
      .drop("__rk", "__rus", "__lus")
  }

  /** Integer-exact exponentially-decayed feature state per key: fold
    * the key's history in event order with `e := (e >> 1) + v_micro` —
    * each observation halves everything before it (a per-observation
    * half-life). The shift is floor division on a non-negative
    * accumulator, so the fold is pure integer arithmetic and
    * reproducible bit-for-bit in any engine — the property that lets
    * a feature store recompute the state during backfill and get the
    * EXACT serving value, not a float-close one.
    *
    * ONE shuffle on the key; the per-key array is bounded by the key's
    * own history (at lake scale, pre-filter to the feature window —
    * the fold's decay makes old events irrelevant anyway: after 40
    * halvings any bounded value is gone).
    */
  def ewmaMicro(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      tieCol: String = "event_id"): DataFrame = {
    val obs = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("key"),
        struct(unix_micros(col(tsCol)).as("us"), col(tieCol).as("tie"),
          floor(col(valCol) * 1e6).cast("long").as("vm")).as("o"))
    obs.groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        // sort AFTER collect: the fold's order contract is (ts, tie),
        // independent of arrival / partition order
        aggregate(array_sort(collect_list(col("o"))), lit(0L),
          (acc, x) => shiftright(acc, 1) + x.getField("vm")).as("ewma_micro"))
      .orderBy("key")
  }

  /** Gap-fill resample with last-observation-carried-forward: one row
    * per key per `stepUs` bucket between the key's first and last
    * observation, carrying the latest observed value through empty
    * buckets (`filled` = 1 where the bucket had its own observation).
    * The regular-grid + LOCF shape every training-feature join needs
    * before time-aligned models see the data.
    *
    * All bucket arithmetic is integer epoch-micros. The per-bucket
    * representative is the bucket's latest observation by (ts, tie).
    * Everything shuffles on the key once (bucket window + span agg
    * reuse it); the grid explode is bounded by the key's own span —
    * at lake scale, clamp the span (or pre-slice the time range) the
    * same way the scan window does.
    */
  def gapFill(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", valCol: String = "value",
      stepUs: Long = 3600000000L, tieCol: String = "event_id"): DataFrame = {
    val t = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__us"),
        col(tieCol).as("__tie"), col(valCol).as("__v"))
      // integral `div`, not floor(double /): epoch-micros sit near the
      // 2^53 mantissa edge where a rounded quotient could cross a
      // bucket boundary — the oracle's BIGINT `//` is exact, so be too
      .withColumn("bucket", expr(s"__us div ${stepUs}L"))
    // latest observation inside each bucket (the bucket "close")
    val wObs = Window.partitionBy("key", "bucket")
      .orderBy(col("__us").desc, col("__tie").desc)
    val obs = t.withColumn("__rn", row_number().over(wObs))
      .where(col("__rn") === 1).select("key", "bucket", "__v")
    // dense bucket grid across each key's observed span
    val grid = t.groupBy("key")
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col("key"), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val wCarry = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        last(col("__v"), ignoreNulls = true).over(wCarry).as("value"),
        when(col("__v").isNotNull, 1).otherwise(0).cast("int").as("filled"))
      .withColumn("bucket_ts", timestamp_micros(col("bucket") * stepUs))
      .select("key", "bucket_ts", "value", "filled")
      .orderBy("key", "bucket_ts")
  }

  /** Gap-based sessionization: events more than `gapUs` microseconds
    * apart start a new session per key. Two window passes over one
    * key-shuffle, then the per-session aggregate. Timestamps compare
    * in integer epoch-micros so results are engine-exact.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy("__us")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(keyCol).as("key"), unix_micros(col(tsCol)).as("__us"))
      .where(col("__us").isNotNull) // null event times sort differently
                                    // across engines; exclude them
      .withColumn("__new",
        when(lag(col("__us"), 1).over(w).isNull ||
          col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .groupBy("key", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"), max(col("__us")).as("end_us"))
      .orderBy("key", "session_id")
  }

  /** Peak interval concurrency per group — the sweep-line maximum
    * ("most sessions open at once", capacity planning's first
    * question). Each event opens a half-open interval
    * `[ts, ts + durationUs)`; +1/−1 deltas NET per distinct (group,
    * instant) — so a close and an open at the same microsecond cancel
    * before the scan, which IS the half-open semantic and removes
    * every running-sum tie ambiguity. Returns each group's peak and
    * the first instant it is reached.
    *
    * Scale shape — the running sum does NOT use a per-group window
    * (that would shuffle every delta of a group into one partition:
    * the low-cardinality skew trap). Instead it is the
    * [[Par.globalRowNumber]] two-pass: range-shuffle by (group, t),
    * per-partition partial sums (P×G longs to the driver), prefix
    * offsets broadcast back, bounded within-partition scan. Peak
    * extraction is then a combinable max + a first-instant lookup.
    */
  def peakConcurrency(events: DataFrame, durationUs: Long = 3600000000L,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val iv = events.where(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"), unix_micros(col(tsCol)).as("s"))
    val deltas = iv.select(col("grp"), col("s").as("t"), lit(1L).as("d"))
      .unionByName(iv.select(col("grp"), (col("s") + durationUs).as("t"),
        lit(-1L).as("d")))
      .groupBy("grp", "t").agg(sum(col("d")).as("net"))
    // (grp, t) is unique after the net aggregation, so the prefix
    // scan's rows frame is deterministic; the two-pass shape now
    // lives in Par.prefixSum (this was its template)
    val cum = Par.prefixSum(deltas, Seq("grp"), Seq("t"), "net")
      .localCheckpoint()
    val peaks = cum.groupBy("grp").agg(max(col("cum")).as("peak"))
    cum.join(broadcast(peaks), Seq("grp"))
      .where(col("cum") === col("peak"))
      .groupBy("grp", "peak").agg(min(col("t")).as("peak_at_us"))
      .select(col("grp"), col("peak"), col("peak_at_us"))
      .orderBy("grp")
  }

  /** Interval coverage per group — total union length of (possibly
    * overlapping) intervals plus the merged-island count: "how much
    * wall-clock was at least one session open". Per sorted interval,
    * the contribution is `max(0, e − max(s, prevMaxEnd))` (the part
    * not already covered) and a new island starts when
    * `s > prevMaxEnd`; both are plain aggregates of per-row values,
    * so no island ids are materialized.
    *
    * Scale shape: `prevMaxEnd` is a running MAX, computed with the
    * same two-pass trick as [[peakConcurrency]]'s running sum —
    * range-shuffle on (group, start), per-partition max-end to the
    * driver (P×G longs), exclusive prefix-max offsets broadcast back,
    * bounded within-partition window. Never one partition per group.
    */
  def intervalCoverage(events: DataFrame, durationUs: Long = 3600000000L,
      groupCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    val iv = events.where(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"), unix_micros(col(tsCol)).as("s"))
      .withColumn("e", col("s") + durationUs)
    val n = spark.sparkContext.defaultParallelism
    val ranged = iv.repartitionByRange(n, col("grp"), col("s"), col("e"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val parts = ranged.groupBy("__pid", "grp").agg(max(col("e")).as("me"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // exclusive prefix max per group in pid order; only pids with a
    // predecessor get a row (others join to null)
    val offsets = parts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zipWithIndex.drop(1).map { case ((pid, _, _), i) =>
        (pid, g, sorted.take(i).map(_._3).max)
      }
    }
    val cov = if (offsets.isEmpty) {
      ranged.withColumn("__off", lit(null).cast("long"))
    } else {
      ranged.join(broadcast(spark.createDataFrame(offsets)
        .toDF("__pid", "grp", "__off")), Seq("__pid", "grp"), "left")
    }
    val w = Window.partitionBy("__pid", "grp").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, -1)
    cov.withColumn("pmLocal", max(col("e")).over(w))
      .withColumn("pm",
        when(col("pmLocal").isNull && col("__off").isNull, lit(null))
          .otherwise(greatest(coalesce(col("pmLocal"), col("__off")),
            coalesce(col("__off"), col("pmLocal")))))
      .groupBy("grp")
      .agg(
        sum(when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
          .as("n_islands"),
        sum(greatest(lit(0L),
          col("e") - greatest(col("s"), coalesce(col("pm"), col("s")))))
          .as("covered_us"))
      .orderBy("grp")
  }

  /** Watermark-lateness audit: replay the stream's arrival order
    * (event id as the arrival proxy a batch table has) and count,
    * per group, the events that a watermark of `delayUs` would have
    * dropped — `late ⟺ ts < running_max(ts) − delay` over arrival
    * order — plus the worst lateness seen. The number to read BEFORE
    * picking `withWatermark`'s delay: it turns "how late is my
    * data" from folklore into a measured distribution. One per-group
    * prefix-max window over (group-partitioned) arrival order, one
    * combinable aggregate.
    */
  def latenessAudit(events: DataFrame, delayUs: Long,
      grpCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy("grp").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col(grpCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(grpCol).as("grp"), col(idCol).as("id"),
        expr(s"unix_micros($tsCol)").as("us"))
      .withColumn("hwm", max(col("us")).over(w))
      .withColumn("late_us",
        greatest(col("hwm") - lit(delayUs) - col("us"), lit(0L)))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
      .select(col("grp"), col("n"), col("n_late"),
        expr("n_late * 1000000 div n").as("late_ppm"),
        col("max_late_us"))
      .orderBy("grp")
  }

  /** Incremental sessionization with state handoff — the daily-batch
    * form of [[sessionize]]: sessions whose gap window has CLOSED by
    * the batch edge (`end + gap ≤ max event time`) emit as final
    * (`closed`), sessions still inside their gap window emit as
    * carry-state (`open`) for the next batch to resume (union the
    * open rows' keys' raw events back in, or seed the next batch's
    * lag with `end_us`). Without this split a daily job double-counts
    * every boundary-spanning session — the standard incremental
    * sessionize contract, batch twin of the streaming
    * `session_window` state.
    *
    * Same shape as sessionize (per-key window over event times, one
    * key shuffle) plus one broadcast scalar (the batch edge).
    */
  def sessionizeIncremental(events: DataFrame, keyCol: String,
      tsCol: String, gapUs: Long): DataFrame = {
    val sessions = sessionize(events, keyCol, tsCol, gapUs)
      .localCheckpoint()
    val edge = sessions.agg(max(col("end_us"))).head.getLong(0)
    sessions
      .withColumn("status",
        when(col("end_us") + gapUs <= edge, "closed").otherwise("open"))
      .select(col("key"), col("session_id"), col("n_events"),
        col("start_us"), col("end_us"), col("status"))
      .orderBy("key", "session_id")
  }

  /** Token-bucket alert throttling — the rate-limit gate an alerting
    * pipeline puts between trigger and notification: each key holds a
    * bucket of `capacity` tokens refilling one token per `refillUs`;
    * every event first accrues elapsed credit (capped at capacity),
    * then spends one token if a full token is available (`allowed`),
    * else is suppressed. Classic burst-of-`capacity`,
    * sustained-1-per-refill contract.
    *
    * Division-free integer arithmetic: credit is kept in
    * MICROSECONDS-of-refill (one token ≡ `refillUs` µs), so refill is
    * a plain `Δus` add and the spend a subtract — no floor division
    * anywhere, bit-exact in any engine. `avail_us` reports the credit
    * at arrival (`avail_us div refillUs` = whole tokens).
    *
    * Scale shape: a per-key ordered fold — keys hash-distribute, and
    * the in-plan codegen'd `aggregate` fold walks each key's sorted
    * event array once. Per-key arrays are collect_list-bounded like
    * [[graft.engine.Trigger]] snippets: right for alert-keyed streams
    * (events per key per window is moderate); an unbounded-key
    * variant belongs in the streaming twin
    * ([[graft.streaming.StreamingAlerts]] keyed state), where the
    * bucket is two longs of state per key and nothing is collected.
    */
  def tokenBucket(events: DataFrame, capacity: Int = 3,
      refillUs: Long = 86400000000L, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    val capUs = capacity * refillUs
    val sorted = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull)
      .select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("us"),
        col(idCol).cast("long").as("id"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("us"), col("id")))).as("evs"))
    val folded = sorted.withColumn("res",
      aggregate(
        col("evs"),
        struct(lit(capUs).as("tok"), lit(null).cast("bigint").as("prev"),
          expr("cast(array() as " +
            "array<struct<id:bigint,allowed:boolean,avail_us:bigint>>)")
            .as("out")),
        (acc, e) => {
          val delta = when(acc.getField("prev").isNull, lit(0L))
            .otherwise(e.getField("us") - acc.getField("prev"))
          val avail = least(lit(capUs), acc.getField("tok") + delta)
          val allowed = avail >= lit(refillUs)
          struct(
            (avail - when(allowed, lit(refillUs)).otherwise(lit(0L)))
              .as("tok"),
            e.getField("us").as("prev"),
            concat(acc.getField("out"),
              array(struct(e.getField("id").as("id"),
                allowed.as("allowed"), avail.as("avail_us")))).as("out"))
        },
        acc => acc.getField("out")))
    folded.select(col("k"), explode(col("res")).as("r"))
      .select(col("k").as(keyCol), col("r.id").as(idCol),
        col("r.allowed").as("allowed"), col("r.avail_us").as("avail_us"))
      .orderBy(keyCol, idCol)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/warehouse analytics over the event stream: incremental
  * aggregate-view maintenance, funnel conversion, retention cohorts.
  * All integer arithmetic (epoch-micro days, micro-unit values,
  * counts) — exact in any engine.
  */
object Analytics {

  /** Count/sum aggregate state per key — the mergeable materialized-
    * view row. `vm` is the value in micro units so sums stay integer.
    */
  def countSumState(events: DataFrame, keyCol: String = "user_id",
      valCol: String = "value"): DataFrame =
    events.where(col(keyCol).isNotNull && col(valCol).isNotNull)
      .select(col(keyCol).as("key"),
        floor(col(valCol) * 1e6).cast("long").as("vm"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("vm").as("sum_micro"))

  /** Merge two aggregate states (the incremental-view refresh step:
    * yesterday's materialized state + today's delta = today's view,
    * without rescanning history). Full-outer on the key; counts and
    * sums add. ONE key shuffle over state rows — state is |keys|,
    * not |events|, which is the whole point at 100 TB.
    */
  def mergeCountSum(state: DataFrame, delta: DataFrame): DataFrame =
    state.select(col("key"), col("n").as("an"), col("sum_micro").as("asum"))
      .join(delta.select(col("key"), col("n").as("bn"),
        col("sum_micro").as("bsum")), Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("an"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"),
        (coalesce(col("asum"), lit(0L)) + coalesce(col("bsum"), lit(0L)))
          .as("sum_micro"))

  /** Two-step funnel with a conversion deadline: for each user with a
    * `first` event, the earliest `second` event at-or-after it;
    * converted iff it lands within `windowUs`. One key shuffle (both
    * min-aggregates and the conditional min fold in a single groupBy
    * pass — no self-join, no per-step scan).
    */
  def funnel(events: DataFrame, firstType: String, secondType: String,
      windowUs: Long = 3600000000L, keyCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    val base = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isin(firstType, secondType))
      .select(col(keyCol).as("key"), col(typeCol).as("t"),
        unix_micros(col(tsCol)).as("us"))
    // one pass: the first-step min and the second-step candidate set
    // (bounded by the key's own history, like ewmaMicro's fold) — the
    // at-or-after constraint resolves after the fold, no self-join
    base.groupBy("key")
      .agg(min(when(col("t") === firstType, col("us"))).as("first_us"),
        collect_list(when(col("t") === secondType, col("us"))).as("seconds"))
      .where(col("first_us").isNotNull)
      .select(col("key"), col("first_us"),
        array_min(filter(col("seconds"), s => s >= col("first_us")))
          .as("second_us"))
      .withColumn("converted",
        when(col("second_us").isNotNull &&
          col("second_us") - col("first_us") <= windowUs, 1).otherwise(0)
          .cast("int"))
      .select("key", "first_us", "second_us", "converted")
      .orderBy("key")
  }

  /** Retention cohorts on integer epoch-days: cohort = the user's
    * first active day, one row per (cohort_day, day_offset) with the
    * distinct users active that many days later. Two key shuffles
    * (per-user cohort fold, then the bounded cohort×offset count) —
    * the classic triangle table.
    */
  def retention(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val days = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .distinct()
    val cohorts = days.groupBy("key").agg(min("day").as("cohort_day"))
    days.join(cohorts, Seq("key"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Rate-spike detection against a trailing baseline — the SOC
    * "traffic is N× its recent normal" monitor: hourly counts per
    * group, compared to the preceding 24 h MEAN via an integer
    * cross-multiplication (`cnt·n24·10⁶ > factorPpm·sum24` ⇔
    * cnt > factor × trailing mean), no division anywhere. The mean
    * divides by the trailing hours actually PRESENT in the frame
    * (n24), so a stream's warm-up hours are judged against their own
    * short baseline instead of spiking vacuously against a
    * zero-padded constant; hours with no trailing data at all can't
    * alert. Returns the spiking hours with their evidence.
    *
    * Scale shape: the raw-event aggregation is map-side combinable
    * and keys by (group, hour); the trailing window runs over the
    * ALREADY-AGGREGATED hourly rows — G×hours rows total, thousands
    * per year per group, so the per-group window partition is small
    * by construction no matter how many raw events fed it (the
    * pre-aggregate-before-window rule).
    */
  /** Linear multi-touch attribution, integer-exact: every purchase
    * splits 10⁶ ppm of credit equally across the SAME user's clicks
    * in the preceding `windowUs`; the integer remainder
    * (10⁶ mod n) goes to the EARLIEST touch, so credit sums to
    * exactly 10⁶ per attributed purchase and the split is
    * deterministic. Output is per click: how many purchases it
    * touched and its total credit.
    *
    * Scale shape: the touch join is the q40 interval shape — user-key
    * equi-join with a residual time-range predicate, never a time
    * cross join; the per-purchase rank window is bounded by clicks
    * per user per day; the final per-click rollup is map-side
    * combinable.
    */
  def linearAttribution(events: DataFrame, windowUs: Long = 86400000000L,
      convType: String = "purchase", touchType: String = "click")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(t: String, idAs: String, usAs: String) = events
      .where(col("event_type") === t && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id"), col("event_id").as(idAs),
        unix_micros(col("ts")).as(usAs))
    val p = side(convType, "p_id", "p_us")
    val c = side(touchType, "c_id", "c_us")
    val touch = p.join(c, Seq("user_id"))
      .where(col("c_us") < col("p_us") &&
        col("c_us") >= col("p_us") - windowUs)
    val wN = Window.partitionBy("p_id")
    val wR = Window.partitionBy("p_id").orderBy("c_us", "c_id")
    touch
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(wR))
      .withColumn("w_ppm",
        expr("1000000 div n") +
          when(col("rn") === 1, expr("1000000 % n")).otherwise(0L))
      .groupBy(col("c_id").as("click_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("w_ppm")).as("total_ppm"))
      .orderBy("click_id")
  }

  def rateSpikes(events: DataFrame, factorPpm: Long = 2000000L,
      trailingHours: Int = 24, groupCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .where(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) div 3600000000").as("hour"))
      .groupBy("grp", "hour").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy("hour")
      .rangeBetween(-trailingHours, -1)
    hourly.withColumn("sum24", sum(col("cnt")).over(w))
      .withColumn("n24", count(lit(1)).over(w))
      .where(col("sum24").isNotNull &&
        col("cnt") * col("n24") * 1000000L > lit(factorPpm) * col("sum24"))
      .select(col("grp"), (col("hour") * 3600000000L).as("hour_us"),
        col("cnt"), col("sum24"), col("n24"))
      .orderBy("grp", "hour_us")
  }

  /** k-step funnel: users completing `steps` IN ORDER, each step
    * within `stepWindowUs` of the previous one, reported as per-step
    * survivor counts. Existence of an ordered chain is decided by the
    * greedy-earliest recurrence — `t₁ = min ts(step₁)`, `tᵢ₊₁ =
    * min ts(stepᵢ₊₁) in (tᵢ, tᵢ + window]` — which is exact: taking
    * the earliest feasible occurrence can only widen later options,
    * so greedy succeeds iff any chain exists.
    *
    * Shape: k fixed rounds, each one equi-join keyed by user between
    * the (pre-filtered, step-only) event slice and the user-sized
    * survivor table, folded by a combinable min — never a per-user
    * sort or collect; plan depth is static in k.
    */
  def funnelK(events: DataFrame, steps: Seq[String],
      stepWindowUs: Long = 7L * 86400000000L,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnelK needs at least one step")
    val base = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        expr(s"unix_micros($tsCol)").as("tsv"))
    var cur = base.where(col("et") === steps.head)
      .groupBy("u").agg(min(col("tsv")).as("t"))
    val rounds = Seq.newBuilder[DataFrame]
    rounds += cur
    for (s <- steps.tail) {
      cur = base.where(col("et") === s)
        .join(cur.withColumnRenamed("t", "pt"), Seq("u"))
        .where(col("tsv") > col("pt") &&
          col("tsv") <= col("pt") + stepWindowUs)
        .groupBy("u").agg(min(col("tsv")).as("t"))
      rounds += cur
    }
    rounds.result().zipWithIndex.map { case (d, i) =>
      d.select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"))
    }.reduce(_ unionByName _)
      .groupBy("step_idx", "step").agg(count(lit(1)).as("users"))
      .orderBy("step_idx")
  }

  /** First-order Markov transition matrix over per-user event
    * streams: for each ordered (event → next event) adjacency within
    * a user's timeline, the count and the row-normalized transition
    * probability in exact ppm — "after a click, what happens next".
    * The ordering key is TOTAL (`ts, id`) so lead() is deterministic
    * under timestamp ties.
    *
    * Shape: one per-user window (state bounded by a user's events,
    * the natural partition key), then a combinable pair-count
    * aggregate and a broadcast of per-source totals — |types|²
    * output regardless of input scale.
    */
  def transitionMatrix(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy("u").orderBy("ts", "id")
    val t = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("nt", lead(col("t"), 1).over(w))
      .where(col("nt").isNotNull)
    val cnt = t.groupBy(col("t").as("from_type"), col("nt").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("from_type").agg(sum(col("cnt")).as("row_total"))
    cnt.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("cnt"),
        col("row_total"),
        expr("cnt * 1000000 div row_total").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** Association-rule mining over basket data: item pairs with
    * support ≥ `minSup`, both directed confidences and the
    * symmetric lift, all integer ppm (floor). With `c(x)` = baskets
    * containing x and `N` baskets: `conf(a→b) = c(ab)·10⁶ div c(a)`,
    * `lift = c(ab)·N·10⁶ div (c(a)·c(b))` (lift > 10⁶ ⟺ positive
    * association). The market-basket / co-occurrence primitive.
    *
    * Scale shape: the pair join is keyed by BASKET (`a.o = b.o`,
    * `a.p < b.p`), so candidates are Σ|basket|² — linear in rows for
    * bounded basket sizes — never item². Item counts and the basket
    * total are combinable aggregates broadcast back onto the
    * (support-filtered, therefore small) pair table. Long ppm
    * arithmetic holds to ~10⁹ baskets; past that switch the lift
    * numerator to decimal.
    */
  def frequentPairs(baskets: DataFrame, basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey", minSup: Long = 3L): DataFrame = {
    val op = baskets
      .select(col(basketCol).as("o"), col(itemCol).as("p"))
      .where(col("o").isNotNull && col("p").isNotNull)
      .distinct().localCheckpoint() // reused by counts and the pair join
    val nOrders = op.agg(countDistinct(col("o")).as("n_baskets"))
    val items = op.groupBy("p").agg(count(lit(1)).as("c"))
    val pairs = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minSup)
    pairs
      .join(broadcast(items.select(col("p").as("pa"), col("c").as("ca"))),
        "pa")
      .join(broadcast(items.select(col("p").as("pb"), col("c").as("cb"))),
        "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("cab"), col("ca"), col("cb"),
        expr("cab * 1000000 div ca").as("conf_ab_ppm"),
        expr("cab * 1000000 div cb").as("conf_ba_ppm"),
        expr("(cab * n_baskets * 1000000) div (ca * cb)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("pa"), col("pb"))
  }

  /** Automated spike drill-down: find THE strongest hourly spike
    * across event types (integer excess `cnt·n_hours − total` — n·x
    * minus the sum, the mean-free spike score), then attribute it:
    * the top users inside that hour with their in-spike share vs
    * their baseline share of the same event type (both exact ppm).
    * The "what blew up and who did it" page an on-call run opens
    * first — q158 raises the alarm, this names the driver.
    *
    * Shape: one (type, hour) count + per-type totals (combinable), a
    * 1-row argmax broadcast back onto the raw scan for the single
    * spike hour, then one per-user count inside it — the drill-down
    * join touches only the spike hour's rows.
    */
  def spikeDrilldown(events: DataFrame, topUsers: Int = 5,
      typeCol: String = "event_type", keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val base = events
      .where(col(typeCol).isNotNull && col(keyCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(typeCol).as("t"), col(keyCol).as("u"),
        expr(s"unix_micros($tsCol) div 3600000000").as("h"))
      .localCheckpoint() // hourly counts + the drill both scan it
    val hourly = base.groupBy("t", "h").agg(count(lit(1)).as("cnt"))
    val totals = base.groupBy("t")
      .agg(count(lit(1)).as("total"), countDistinct(col("h")).as("n_hours"))
    val spike = hourly.join(totals, "t")
      .withColumn("score", col("cnt") * col("n_hours") - col("total"))
      .orderBy(col("score").desc, col("t"), col("h"))
      .limit(1)
      .select(col("t"), col("h"), col("cnt").as("spike_cnt"),
        col("total"), col("score"))
    val inSpike = base.join(broadcast(spike), Seq("t", "h"))
      .groupBy("t", "h", "spike_cnt", "total", "score", "u")
      .agg(count(lit(1)).as("u_cnt"))
    val baseline = base.groupBy(col("t").as("t"), col("u").as("u"))
      .agg(count(lit(1)).as("u_total"))
    inSpike.join(baseline, Seq("t", "u"))
      .select(col("t").as("event_type"),
        (col("h") * 3600000000L).as("hour_start_us"),
        col("spike_cnt"), col("score"), col("u").as("user_id"),
        col("u_cnt"),
        expr("u_cnt * 1000000 div spike_cnt").as("in_spike_share_ppm"),
        expr("u_total * 1000000 div total").as("baseline_share_ppm"))
      .orderBy(col("u_cnt").desc, col("user_id"))
      .limit(topUsers)
  }

  /** Top-k categories + an "other" rollup — the display-cardinality
    * cap every dashboard needs: the k biggest categories by count
    * (ties to name) keep their identity, the tail collapses into one
    * `other` row carrying its total and how many categories it
    * merged. Shares in exact ppm of the grand total.
    *
    * Shape: one combinable category count, a TakeOrdered-k cut, and a
    * broadcast anti-join for the tail — the category axis never
    * globally sorts.
    */
  def topKOther(df: DataFrame, catCol: String, k: Int = 5): DataFrame = {
    val counts = df.where(col(catCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // top-k cut + tail rollup + total share it
    val top = counts.orderBy(col("cnt").desc, col("category")).limit(k)
    val other = counts.join(broadcast(top.select("category")),
        Seq("category"), "left_anti")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("cnt"),
        count(lit(1)).as("n_merged"))
      .select(lit("other").as("category"), col("cnt"), col("n_merged"))
      .where(col("n_merged") > 0)
    val total = counts.agg(sum(col("cnt")).as("tot"))
    top.withColumn("n_merged", lit(1L))
      .unionByName(other)
      .crossJoin(broadcast(total))
      .select(col("category"), col("cnt"), col("n_merged"),
        expr("cnt * 1000000 div tot").as("share_ppm"))
      .orderBy(col("cnt").desc, col("category"))
  }

  /** Apriori level-3: frequent item TRIPLES grown from the frequent
    * pairs, with the anti-monotone prune IN-PLAN — a triple candidate
    * exists only by extending a frequent (pa, pb) with a same-basket
    * item pc > pb, so the blow-up a naive 3-way basket self-join
    * invites (every C(|basket|, 3)) never materializes: infrequent
    * pairs are dead before the third join. Emits support and the
    * extension confidence `(pa,pb) → pc`.
    *
    * Shape: the pair stage is [[frequentPairs]]' basket-keyed join +
    * combinable count with the support HAVING; the extend stage joins
    * the surviving pairs back to baskets on the basket key. At 100 TB
    * the support cutoff is the whole ballgame — it caps every
    * downstream cardinality, which is exactly Apriori's point.
    */
  def frequentTriples(baskets: DataFrame, basketCol: String = "l_orderkey",
      itemCol: String = "l_partkey", minSup: Long = 3L): DataFrame = {
    val op = baskets
      .select(col(basketCol).as("o"), col(itemCol).as("p"))
      .where(col("o").isNotNull && col("p").isNotNull)
      .distinct().localCheckpoint() // pair join + the extend join
    val pairBaskets = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.o").as("ob"), col("a.p").as("pa"), col("b.p").as("pb"))
    val pairs = pairBaskets.groupBy("pa", "pb")
      .agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minSup)
    val triples = pairBaskets
      .join(pairs, Seq("pa", "pb")) // anti-monotone prune
      .join(op.as("c"), col("c.o") === col("ob") && col("c.p") > col("pb"))
      .groupBy(col("pa"), col("pb"), col("c.p").as("pc"))
      .agg(count(lit(1)).as("support"), max(col("cab")).as("cab"))
      .where(col("support") >= minSup)
    triples
      .select(col("pa"), col("pb"), col("pc"), col("support"),
        expr("support * 1000000 div cab").as("conf_ext_ppm"))
      .orderBy(col("support").desc, col("pa"), col("pb"), col("pc"))
  }

  /** Next-event prediction eval: train the [[transitionMatrix]]-style
    * first-order model on one user split, score hit@1 / hit@3 on the
    * held-out split — the full train/evaluate loop of a sequence
    * recommender, in-engine, with exact ppm metrics per prior state.
    * The split is a seeded user hash (`mix31(user) % 2`), so train
    * and eval never share a user (the leakage rule q166-style
    * splits enforce for documents applies to behavioral sequences
    * too: a user's own history in train inflates their eval hits).
    *
    * A transition whose prior state never occurred in train scores a
    * miss at every k (the honest cold-start accounting). Candidate
    * ranking breaks count ties by event-type name, so hit@k is
    * deterministic. Scale: train counts + rank are
    * |states|²-bounded and broadcast; eval pairs come off one
    * per-user window, one combinable final aggregate.
    */
  def nextEventEval(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    import graft.ops.Similarity.mix31Col
    val w = Window.partitionBy("u").orderBy("ts", "id")
    val pairs = events
      .where(col(userCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("t"),
        col(tsCol).as("ts"), col(idCol).as("id"),
        (mix31Col(col(userCol).cast("long")) % 2).as("split"))
      .withColumn("nt", lead(col("t"), 1).over(w))
      .where(col("nt").isNotNull)
      .localCheckpoint() // train counts and eval probes share it
    val ranked = pairs.where(col("split") === 0)
      .groupBy(col("t").as("from_type"), col("nt").as("cand"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("from_type")
          .orderBy(col("cnt").desc, col("cand"))))
      .where(col("rnk") <= 3)
    val scored = pairs.where(col("split") === 1)
      .join(broadcast(ranked),
        pairs("t") === ranked("from_type") && pairs("nt") === ranked("cand"),
        "left")
    scored.groupBy(col("t").as("from_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("hit1"),
        sum(when(col("rnk").isNotNull, 1L).otherwise(0L)).as("hit3"))
      .select(col("from_type"), col("n_eval"), col("hit1"), col("hit3"),
        expr("hit1 * 1000000 div n_eval").as("hit1_ppm"),
        expr("hit3 * 1000000 div n_eval").as("hit3_ppm"))
      .orderBy("from_type")
  }

  /** ABC / Pareto revenue classification — rank parts by exact
    * decimal revenue and cut the cumulative share at 70% (A), 90%
    * (B), rest C: the classic "which 10% of the catalog is 70% of
    * the money" inventory table. Revenue is the q01 decimal-exact
    * product floored to micro per row, so both engines sum identical
    * longs; the cumulative comes from [[Par.prefixSum]] (range
    * exchange + broadcast offsets — no single-partition window over
    * the part table); the 70/90 cuts are integer threshold compares
    * against driver scalars.
    */
  def abcClasses(lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .where(col("l_partkey").isNotNull)
      .select(col("l_partkey").as("part"),
        ((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))) * 1000000)
          .cast("long").as("rm"))
      .groupBy("part").agg(sum(col("rm")).as("rev_micro"))
      .withColumn("negrev", -col("rev_micro"))
    val cum = Par.prefixSum(rev, Seq(), Seq("negrev", "part"), "rev_micro")
      .localCheckpoint()
    val tot = cum.agg(sum(col("rev_micro"))).head.getLong(0)
    require(tot > 0, "abcClasses: no revenue")
    val (cutA, cutB) = (tot * 7 / 10, tot * 9 / 10)
    cum
      .withColumn("cls", when(col("cum") <= cutA, "A")
        .when(col("cum") <= cutB, "B").otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("rev_micro")).as("rev_micro_total"))
      .select(col("cls"), col("n_parts"), col("rev_micro_total"),
        expr(s"cast(rev_micro_total as decimal(38,0)) * 1000000" +
          s" div ${tot}L").as("share_ppm"))
      .orderBy("cls")
  }

  /** Dimension delta attribution (the Adtributor shape, exact): split
    * the stream at its temporal midpoint and, for every value of
    * every declared dimension, report how much of the OVERALL count
    * delta that value explains (`contrib_ppm`, signed — values can
    * move against the total) and how its traffic share shifted.
    * This is the root-cause table an on-call reads when a metric
    * jumps: "the +18% is 92% the `error` type on weekends".
    *
    * Scale shape: one conditional-count pass per dimension (each
    * map-side combinable, |values| rows out), overall totals from
    * the first dimension's sums, broadcast back — the stream scans
    * once per dimension, nothing value-scale shuffles.
    */
  def deltaAttribution(events: DataFrame,
      dims: Seq[(String, Column)], tsCol: String = "ts"): DataFrame = {
    require(dims.nonEmpty, "deltaAttribution needs at least one dimension")
    val us = unix_micros(col(tsCol))
    val bounds = events.where(col(tsCol).isNotNull)
      .agg(min(us).as("lo"), max(us).as("hi")).head
    val split = (bounds.getLong(0) + bounds.getLong(1) + 1L) / 2L
    val perDim = dims.map { case (name, c) =>
      events.where(col(tsCol).isNotNull && c.isNotNull)
        .groupBy(c.cast("string").as("value"))
        .agg(
          sum(when(us < split, 1L).otherwise(0L)).as("prev_cnt"),
          sum(when(us >= split, 1L).otherwise(0L)).as("cur_cnt"))
        .select(lit(name).as("dim"), col("value"), col("prev_cnt"),
          col("cur_cnt"))
    }
    val union = perDim.reduce(_.unionByName(_)).localCheckpoint()
    val totals = union.where(col("dim") === dims.head._1)
      .agg(sum(col("prev_cnt")).as("tp"), sum(col("cur_cnt")).as("tc"))
    union.crossJoin(broadcast(totals))
      .select(col("dim"), col("value"), col("prev_cnt"), col("cur_cnt"),
        (col("cur_cnt") - col("prev_cnt")).as("delta"),
        expr("(cur_cnt - prev_cnt) * 1000000 div nullif(tc - tp, 0)")
          .as("contrib_ppm"),
        expr("cur_cnt * 1000000 div tc - prev_cnt * 1000000 div tp")
          .as("share_shift_ppm"))
      .orderBy("dim", "value")
  }

  /** SRE burn-rate page condition over the event stream: per day, the
    * error share of the trailing 1-day and trailing 7-day windows in
    * ppm, and the multi-window page flag (BOTH above `budgetPpm` —
    * the short window proves it's happening now, the long one that
    * it's not a blip; the standard fast+slow burn pairing). Day
    * windows are ROWS frames over the daily aggregate, so a 100 TB
    * stream folds to |days| rows before any window runs.
    */
  def burnRate(events: DataFrame, budgetPpm: Long = 100000L,
      errType: String = "error", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val daily = events
      .where(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .agg(count(lit(1)).as("tot_1d"),
        sum((col(typeCol) === errType).cast("long")).as("err_1d"))
    val w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("tot_7d", sum(col("tot_1d")).over(w7))
      .withColumn("err_7d", sum(col("err_1d")).over(w7))
      .select(col("day"), col("err_1d"), col("tot_1d"),
        expr("err_1d * 1000000 div tot_1d").as("ratio_1d_ppm"),
        col("err_7d"), col("tot_7d"),
        expr("err_7d * 1000000 div tot_7d").as("ratio_7d_ppm"),
        (expr("err_1d * 1000000 div tot_1d") > budgetPpm &&
         expr("err_7d * 1000000 div tot_7d") > budgetPpm).as("page"))
      .orderBy("day")
  }

  /** Conversion-latency distribution for a [[funnel]] step pair:
    * nearest-rank percentiles (value at row ⌈p·n⌉ of the ascending
    * delay order — exact, no interpolation) of first→second delays
    * over CONVERTED keys. The number a product/alerting review reads
    * next after the conversion rate: not whether users convert, but
    * how long it takes.
    *
    * Global order comes from [[Par.globalRowNumber]] (range exchange
    * + broadcast offsets), so no single-partition window ever holds
    * the delay table.
    */
  def conversionLatency(events: DataFrame, firstType: String,
      secondType: String, windowUs: Long = 3600000000L,
      keyCol: String = "user_id"): DataFrame = {
    val delays = funnel(events, firstType, secondType, windowUs,
        keyCol = keyCol)
      .where(col("converted") === 1)
      .select((col("second_us") - col("first_us")).as("delay_us"))
    val ranked = Par.globalRowNumber(delays, Seq("delay_us"))
      .localCheckpoint()
    val n = ranked.count()
    require(n > 0, s"conversionLatency: no conversions for $firstType→$secondType")
    def rankOf(pPpm: Long): Long = (n * pPpm + 999999L) / 1000000L
    val picks = Map("p50_us" -> rankOf(500000L), "p90_us" -> rankOf(900000L),
      "p99_us" -> rankOf(990000L))
    val cells = picks.map { case (name, r) =>
      ranked.where(col("rownum") === r)
        .select(lit(name).as("pct"), col("delay_us"))
    }.reduce(_.unionByName(_))
    cells.groupBy()
      .pivot("pct", Seq("p50_us", "p90_us", "p99_us"))
      .agg(first(col("delay_us")))
      .withColumn("n_converted", lit(n))
      .select("n_converted", "p50_us", "p90_us", "p99_us")
  }

  /** Kaplan-Meier churn survival curve — the right-censoring-aware
    * "what share of users is still active after k days" estimate that
    * a naive retention ratio gets wrong (users near the observation
    * edge haven't had TIME to churn; dropping them from the at-risk
    * set instead of counting them as churned is the whole point of
    * KM). Lifetime = days between a user's first and last event;
    * users whose last activity is within `censorDays` of the corpus
    * edge are censored (they leave the at-risk set at their lifetime
    * without counting as a churn event). One row per observed
    * lifetime t: at-risk count `n_risk`, churn events `d_churn`, and
    * the survival estimate `s_ppm = Π_{s≤t} floor(S·(n_s−d_s)/n_s)`
    * — the product folded in ppm with per-step floor, so both
    * engines replay identical integer arithmetic.
    *
    * Scale shape: one combinable per-user min/max aggregate (the
    * 100 TB scan folds to |users| rows), one count aggregate to
    * |lifetimes| ≤ observation-window-days rows, and the sequential
    * KM product folds over THAT tiny array in-plan — nothing
    * row-scale ever reaches the fold.
    */
  def survivalCurve(events: DataFrame, censorDays: Long = 3L,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val lifetimes = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .groupBy("k").agg(min(col("day")).as("fd"), max(col("day")).as("ld"))
    val gmax = lifetimes.agg(max(col("ld"))).head.getLong(0)
    val byT = lifetimes
      .select((col("ld") - col("fd")).as("t"),
        (col("ld") <= gmax - censorDays).cast("long").as("churn"))
      .groupBy("t")
      .agg(count(lit(1)).as("ends"), sum(col("churn")).as("d"))
    // at-risk n(t) = users whose lifetime ≥ t: reverse-cumulative ends
    val w = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = byT.withColumn("n", sum(col("ends")).over(w))
      .select("t", "n", "d")
    // sequential KM product over the ≤|days| grid rows: collect the
    // sorted grid into one array and fold with per-step ppm floor
    // ((x − x mod n)/n is exact in double up to 2^53 — ppm·users fits)
    val folded = grid
      .agg(sort_array(collect_list(struct(col("t"), col("n"), col("d"))))
        .as("g"))
      .select(aggregate(col("g"),
        struct(lit(1000000L).as("s"),
          expr("cast(array() as array<struct<" +
            "t:bigint,n_risk:bigint,d_churn:bigint,s_ppm:bigint>>)")
            .as("out")),
        (acc, e) => {
          val x = acc.getField("s") * (e.getField("n") - e.getField("d"))
          val s2 = ((x - pmod(x, e.getField("n"))) / e.getField("n"))
            .cast("long")
          struct(s2.as("s"),
            concat(acc.getField("out"), array(struct(
              e.getField("t").as("t"), e.getField("n").as("n_risk"),
              e.getField("d").as("d_churn"), s2.as("s_ppm")))).as("out"))
        },
        acc => acc.getField("out")).as("res"))
      .select(explode(col("res")).as("r"))
    folded.select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
        col("r.d_churn").as("d_churn"), col("r.s_ppm").as("s_ppm"))
      .orderBy("t")
  }

  /** Contiguous 3-event sequence mining: the most common
    * `e₁ → e₂ → e₃` runs across user event streams (per-user total
    * order `(ts, event_id)` — the same tie ladder as
    * [[transitionMatrix]], which is this op's bigram special case),
    * with both raw occurrence count and distinct-user support so a
    * single looping user can't fake a popular path. Top-N under a
    * TOTAL order (count desc, then the trigram itself) so the cut is
    * deterministic.
    *
    * Shape: one per-user key shuffle for the two leads, then a
    * combinable (e₁,e₂,e₃) count-and-support aggregate, then a
    * TakeOrdered N — never a global sort. Sequence state is two
    * lookahead rows per task, so a 100 TB stream costs exactly its
    * one user-key shuffle.
    */
  /** Daily active / new / returning users with the cumulative
    * distinct-user curve — the audience dashboard derived without any
    * distinct-over-window: a user is "new" on their first-seen day
    * (min-day fold), so dailies are plain counts and the cumulative
    * distinct total is the prefix sum of news (every user charged
    * exactly once, [[graft.ops.TextAnalysis.vocabGrowth]]'s
    * first-occurrence trick on users instead of types).
    *
    * Shape: one (user, day) distinct + per-user min fold — both
    * combinable key shuffles; the trailing prefix window runs over
    * the DAY grid (calendar-bounded), not the data.
    */
  def dailyActiveUsers(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val days = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div 86400000000").as("day"))
      .distinct()
    val act = days.groupBy("day").agg(count(lit(1)).as("n_active"))
    val news = days.groupBy("key").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    act.join(news, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy("day")
  }

  def frequentSequences(events: DataFrame, topN: Int = 20,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(expr(s"unix_micros($tsCol)"), col(idCol))
    events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("u"), col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .where(col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("u")).as("n_users"))
      .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
      .limit(topN)
  }

  /** Sequential-pattern support (PrefixSpan level 2 with unbounded
    * gap): for every ordered type pair a→b, how many users emitted
    * some `a` strictly before some `b` — the subsequence-containment
    * count q272's ADJACENT trigrams can't see (a → … → b across any
    * distance still counts here). Containment test per user is just
    * `min_ts(a) < max_ts(b)`, so the whole op rides one combinable
    * (user, type) min/max aggregate.
    *
    * Scale shape: the raw scan folds to |users|·|types| rows; the
    * a×b expansion multiplies by |types| (a catalog constant, not a
    * data dimension), and the final count groups to |types|². The
    * one shuffle is the per-user aggregate key.
    */
  def sequentialPairSupport(events: DataFrame,
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val ut = events
      .where(col(typeCol).isNotNull && col(userCol).isNotNull &&
        col(tsCol).isNotNull)
      .groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(expr(s"unix_micros($tsCol)")).as("lo"),
        max(expr(s"unix_micros($tsCol)")).as("hi"))
    pairSupportFromUt(ut)
  }

  /** Stationary distribution of the event-type Markov chain (q183's
    * transition matrix iterated to its fixed point): four exact
    * integer power sweeps `v_{k+1}(j) = Σ_i v_k(i)·p_ij_ppm div 10⁶`
    * from the uniform start, reported beside the EMPIRICAL type share
    * — the gap says how far the chain's long-run behavior sits from
    * today's mix (the "where is this heading" column on a journey
    * dashboard). All ppm integer arithmetic; truncation loses < 1 ppm
    * per type per sweep, and both engines truncate identically.
    *
    * Scale shape: the raw scan folds to the |types|² matrix (one
    * user-key shuffle for the lead); every sweep is a join on that
    * catalog-sized grid.
    */
  def stationaryDistribution(events: DataFrame, sweeps: Int = 4)
      : DataFrame = {
    val byUser = Window.partitionBy("u").orderBy("ts", "id")
    val t = events
      .where(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").as("u"), col("event_type").as("et"),
        col("ts"), col("event_id").as("id"))
    val pairs = t
      .withColumn("to_type", lead(col("et"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .select(col("et").as("from_type"), col("to_type"))
    val c = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // matrix + row totals + every sweep read it
    val p = c.join(
        c.groupBy("from_type").agg(sum("cnt").as("row_total")),
        "from_type")
      .select(col("from_type").as("i"), col("to_type").as("j"),
        expr("cnt * 1000000 div row_total").as("p_ppm"))
      .localCheckpoint()
    val types = p.select(col("i").as("ty")).distinct()
      .localCheckpoint()
    val nTypes = types.count()
    var v = types.select(col("ty"),
      lit(1000000L / nTypes).as("v_ppm"))
    (1 to sweeps).foreach { _ =>
      v = p.join(v, p("i") === v("ty"))
        .groupBy(col("j").as("newTy"))
        .agg(expr("sum(v_ppm * p_ppm) div 1000000").as("v_ppm"))
        .withColumnRenamed("newTy", "ty")
        .localCheckpoint()
    }
    val empirical = t.groupBy(col("et").as("ty"))
      .agg(count(lit(1)).as("n"))
    val totalN = empirical.agg(sum("n").as("tot"))
    v.join(empirical, "ty").crossJoin(broadcast(totalN))
      .select(col("ty").as("event_type"),
        col("v_ppm").as("stationary_ppm"),
        expr("n * 1000000 div tot").as("empirical_ppm"))
      .withColumn("gap_ppm",
        col("stationary_ppm") - col("empirical_ppm"))
      .orderBy("event_type")
  }

  /** RFM segmentation: per-user Recency (days since last event),
    * Frequency (event count) and Monetary (cent total), each scored
    * into quintiles over a TOTAL order (metric, then user id — ntile
    * is deterministic only under a total order, so the tiebreak is
    * part of the contract), rolled up to segment cells. Score 5 =
    * best (most recent / most frequent / highest spend).
    *
    * Scale shape: one combinable per-user fold; the ntile windows run
    * over user-level rows; the rollup is ≤ 125 cells.
    */
  def rfmSegments(events: DataFrame): DataFrame = {
    val per = events
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .groupBy(col("user_id").as("u"))
      .agg(max(expr("unix_micros(ts) div 86400000000")).as("last_d"),
        count(lit(1)).as("f"),
        sum(expr("cast(round(value * 100) as bigint)")).as("m_c"))
    rfmScoreTail(per)
  }

  /** The quintile-scoring tail over an already-folded
    * (u, last_d, f, m_c) table — shared by the batch op and the
    * streaming twin (whose drained state IS this table).
    */
  private[graft] def rfmScoreTail(per0: DataFrame): DataFrame = {
    val per = per0.localCheckpoint() // dmax probe + scoring share it
    val dmax = per.agg(max("last_d").as("dmax"))
    val scored = per.crossJoin(broadcast(dmax))
      .withColumn("r_days", col("dmax") - col("last_d"))
      // most recent first → ntile 1 = best; flip to 6-n so 5 = best
      .withColumn("r_score",
        expr("6 - ntile(5) over (order by r_days, u)"))
      .withColumn("f_score",
        expr("6 - ntile(5) over (order by f desc, u)"))
      .withColumn("m_score",
        expr("6 - ntile(5) over (order by m_c desc, u)"))
    scored.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum("m_c").as("segment_rev_c"))
      .withColumn("champion",
        col("r_score") === 5 && col("f_score") === 5 &&
          col("m_score") === 5)
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Longest consecutive-active-day streak per user — the
    * gaps-and-islands fold (day − row_number is constant inside a
    * run), reporting each user's best streak and its start. Top
    * `topN` by streak length.
    *
    * Scale shape: distinct (user, day) is one combinable fold; the
    * island window runs inside the per-user partitioning; output is
    * a bounded top-k.
    */
  def activityStreaks(events: DataFrame, topN: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("u")
    val days = events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").as("u"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
    val islands = days
      .withColumn("grp",
        col("d") - row_number().over(byUser.orderBy("d")))
      .groupBy("u", "grp")
      .agg(count(lit(1)).as("len"), min("d").as("start_d"))
    islands
      .withColumn("rn", row_number().over(
        byUser.orderBy(col("len").desc, col("start_d"))))
      .where(col("rn") === 1)
      .select(col("u").as("user_id"), col("len").as("streak_days"),
        col("start_d").as("streak_start_day"))
      .orderBy(col("streak_days").desc, col("user_id"))
      .limit(topN)
  }

  /** Month-over-month revenue bridge: each period's revenue delta
    * decomposed into NEW (customer's first paying month after a zero),
    * EXPANSION (paying more than last month), CONTRACTION (paying
    * less, still paying) and CHURN (paying → zero) — the waterfall
    * every revenue dashboard opens with, in exact cents with the
    * accounting identity `ending = starting + new + expansion −
    * contraction − churn` holding bit for bit.
    *
    * Scale shape: orders fold to (customer, month) sums (combinable);
    * the zero-filled grid is |customers| × |months in span| — months
    * are calendar-bounded, so the grid is a constant factor on the
    * customer dimension, partitioned by customer for the lag.
    */
  def revenueBridge(orders: DataFrame): DataFrame = {
    val rev = orders
      .where(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("o_custkey").as("c"),
        expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").as("m"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("rev_c"))
      .localCheckpoint() // span probe + grid join share it
    val span = rev.agg(min("m").as("m0"), max("m").as("m1"))
    val months = span.select(explode(sequence(col("m0"), col("m1")))
      .as("m"))
    val custs = rev.select(col("c")).distinct()
    val grid = custs.crossJoin(broadcast(months))
      .join(rev, Seq("c", "m"), "left")
      .select(col("c"), col("m"), coalesce(col("rev_c"), lit(0L))
        .as("rev_c"))
    val byCust = Window.partitionBy("c").orderBy("m")
    val lagged = grid
      .withColumn("prev_c", lag(col("rev_c"), 1).over(byCust))
      .where(col("prev_c").isNotNull) // first month has no bridge
    lagged.groupBy("m")
      .agg(
        sum(col("prev_c")).as("starting_c"),
        sum(when(col("prev_c") === 0 && col("rev_c") > 0, col("rev_c"))
          .otherwise(0L)).as("new_c"),
        sum(when(col("prev_c") > 0 && col("rev_c") > col("prev_c"),
          col("rev_c") - col("prev_c")).otherwise(0L)).as("expansion_c"),
        sum(when(col("rev_c") > 0 && col("rev_c") < col("prev_c"),
          col("prev_c") - col("rev_c")).otherwise(0L)).as("contraction_c"),
        sum(when(col("prev_c") > 0 && col("rev_c") === 0, col("prev_c"))
          .otherwise(0L)).as("churned_c"),
        sum(col("rev_c")).as("ending_c"))
      .orderBy("m")
  }

  /** Average-lifetime-value curve: cumulative revenue per user by
    * account age (days since the user's first event), divided at each
    * age by the users OBSERVABLE at that age (first day early enough
    * that the corpus window covers age `a`) — the right-censoring
    * correction that keeps late cohorts from dragging the tail down.
    * Exact milli-cents.
    *
    * Scale shape: one (user, age) fold (combinable) after a
    * broadcast of the per-user first day; the curve itself lives on
    * the age grid (span-bounded).
    */
  def ltvCurve(events: DataFrame): DataFrame = {
    val base = events
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").as("u"),
        expr("unix_micros(ts) div 86400000000").as("d"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
      .localCheckpoint() // first-day fold + age fold share it
    val firstDay = base.groupBy("u").agg(min("d").as("f"))
    val maxDay = base.agg(max("d").as("dmax"))
    val byAgeRows = base.join(firstDay, "u")
      .groupBy((col("d") - col("f")).as("age"))
      .agg(sum("vc").as("rev_c"))
    val atRisk = firstDay.crossJoin(broadcast(maxDay))
      .groupBy((col("dmax") - col("f")).as("horizon"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // grid bound + suffix sum share it
    // dense age grid 0..max horizon; users observable at age a =
    // count(horizon ≥ a), a suffix sum down the grid
    val grid = atRisk.agg(max("horizon").as("hmax"))
      .select(explode(sequence(lit(0L), col("hmax"))).as("age"))
    val byAge = Window.orderBy("age")
    val risk = grid
      .join(atRisk.withColumnRenamed("horizon", "age"), Seq("age"), "left")
      .select(col("age"), coalesce(col("n"), lit(0L)).as("n"))
      .withColumn("at_risk", sum(col("n")).over(
        Window.orderBy(col("age").desc)))
    risk.join(byAgeRows, Seq("age"), "left")
      .select(col("age"), coalesce(col("rev_c"), lit(0L)).as("rev_c"),
        col("at_risk"))
      .withColumn("cum_rev_c", sum(col("rev_c")).over(byAge))
      .withColumn("ltv_milli", expr("cum_rev_c * 1000 div at_risk"))
      .orderBy("age")
  }

  /** The a→b support tail over an already-folded (u, t, lo, hi)
    * table — shared by the batch op and the streaming twin (whose
    * drained state IS this table).
    */
  private[graft] def pairSupportFromUt(ut0: DataFrame): DataFrame = {
    val ut = ut0
      .localCheckpoint() // both sides of the pair expansion + the total
    val total = ut.select(countDistinct(col("u")).as("n_users"))
    ut.as("a").join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.t") =!= col("b.t") &&
          col("a.lo") < col("b.hi"))
      .groupBy(col("a.t").as("first_type"), col("b.t").as("then_type"))
      .agg(countDistinct(col("a.u")).as("support_users"))
      .crossJoin(broadcast(total))
      .withColumn("support_ppm",
        expr("support_users * 1000000 div n_users"))
      .select("first_type", "then_type", "support_users", "support_ppm")
      .orderBy(col("support_users").desc, col("first_type"),
        col("then_type"))
  }
}

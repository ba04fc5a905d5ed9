package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Heavy-hitter discovery with bounded memory — the Misra-Gries
  * sketch as the candidate generator, exact counting as the verifier.
  *
  * The direct spelling — `groupBy(key).count()` over everything —
  * shuffles one row per DISTINCT key: at 100 TB with billions of
  * keys that is the cardinality wall. Misra-Gries holds `k` counters
  * per task and guarantees any item with true partition count
  * `> n_p/(k+1)` survives the partition's sketch; summing partial
  * sketches keeps the guarantee with the errors ADDING, so every item
  * with TOTAL count `> Σ n_p/(k+1) ≈ N/(k+1)` is guaranteed present
  * in the union. Size `k ≫ N/threshold` and the candidate set
  * provably contains every true heavy hitter.
  *
  * The second pass then counts ONLY the candidates exactly (a
  * broadcast semi-join before the aggregate — the shuffle carries at
  * most |tasks|·k candidate keys, not |distinct keys|), and the
  * threshold filter on EXACT counts makes the final answer
  * deterministic and oracle-checkable even though sketch internals
  * depend on arrival order.
  */
object HeavyHitters {

  /** Items of `keyCol` with exact count ≥ `minCount`, found via a
    * capacity-`k` Misra-Gries pass + exact verification.
    *
    * Correctness requires `k + 1 > N / minCount` (else a true heavy
    * hitter could be evicted everywhere and missed) — enforced at
    * runtime against the actual input size, failing loud instead of
    * silently under-reporting.
    */
  def topByCount(df: DataFrame, keyCol: String, minCount: Long,
      k: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long")).where(col(keyCol).isNotNull)
      .as[Long]
    val partials = keys.mapPartitions { it =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      var processed = 0L
      it.foreach { v =>
        processed += 1
        if (m.contains(v)) m(v) += 1
        else if (m.size < k) m(v) = 1
        else {
          // decrement-all step: O(k), amortized O(1) per input row
          // (each decrement pays back k prior increments)
          val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
          m.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else m(key) = c - 1
          }
          dead.foreach(m.remove)
        }
      }
      // sketch rows + ONE summary row carrying the partition's size
      // (the guarantee check needs N = Σ n_p, not a per-row copy)
      m.iterator.map { case (item, est) => (false, item, est) } ++
        Iterator.single((true, 0L, processed))
    }.toDF("is_np", "item", "v")
      .localCheckpoint() // sketch pass runs ONCE; guard + verify reuse it
    // loud guarantee check: N/(k+1) must sit strictly below minCount
    val n = partials.where(col("is_np")).agg(coalesce(sum(col("v")), lit(0L)))
      .head().getLong(0)
    require(n < minCount * (k + 1L),
      s"heavy-hitter guarantee broken: N=$n needs k > ${n / minCount - 1}, " +
        s"got $k — raise k or minCount")
    val cand = partials.where(!col("is_np")).select(col("item")).distinct()
    // exact verify: candidates-only count — broadcast semi-join keeps
    // the aggregate's shuffle at candidate cardinality
    df.join(broadcast(cand), df(keyCol).cast("long") === cand("item"),
        "left_semi")
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col(keyCol))
  }

  /** Count-min sketch frequency estimation over an open token
    * vocabulary, with the exact counts joined back as a standing
    * accuracy report (`est ≥ exact` always — CMS never
    * underestimates; the report shows by how much collisions
    * overshoot at this `w`).
    *
    * Where Misra-Gries ([[topByCount]]) answers "which keys are
    * heavy", CMS answers point frequency queries for ANY key in
    * `d·w` counters: cell `(r, bucket_r(tok))` accumulates every
    * occurrence whose row-`r` hash lands there, and the estimate is
    * the minimum over the `d` rows. At 100 TB the sketch build is one
    * map-side-combinable aggregate into at most `d·w` cells (the
    * shuffle carries `≤ tasks·d·w` partial cells, independent of
    * vocabulary size), and the finished sketch is small enough to
    * broadcast to every probe site.
    *
    * Hashing is engine-portable end to end: token → base-31
    * code-point fold (q38's `rollingHash`), row-salted through
    * `mix31` — so the DuckDB oracle replays signatures, cells, and
    * estimates bit for bit.
    *
    * `minExact` bounds the REPORT (only tokens with exact count ≥
    * `minExact` are listed); every occurrence still feeds the sketch.
    */
  def countMin(docs: DataFrame, textCol: String = "text", w: Int = 1024,
      d: Int = 4, minExact: Long = 10L): DataFrame = {
    import graft.ops.Similarity.mix31Col
    val toks = docs
      .select(explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
    // exact per-token counts once; the sketch inserts per OCCURRENCE,
    // which is the same as adding each token's exact count to its cells
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .withColumn("h", TextAnalysis.rollingHash(col("tok")))
      .localCheckpoint() // shared by the build and the probe side
    val salted = exact.select(col("tok"), col("exact"), col("h"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", mix31Col(col("h") + col("r") * 1000003L) % w)
    val cells = salted.groupBy("r", "bucket")
      .agg(sum(col("exact")).as("cell"))
    val est = salted.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy("tok").agg(min(col("cell")).as("est"))
    exact.where(col("exact") >= minExact)
      .join(est, Seq("tok"))
      .select(col("tok"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overshoot"))
      .orderBy("tok")
  }

  /** Trending-item report: the current window's top-k items with
    * their rank SHIFT against the previous window — the
    * change-detection layer on top of plain heavy hitters (a stable
    * #1 is old news; a #40 jumping to #3 is the story). An item
    * absent from the previous window is flagged `is_new` with NULL
    * prev rank/delta.
    *
    * Scale shape deliberately avoids any global ranking sort: one
    * combinable conditional-count pass folds the event stream to
    * |items| rows; the current top-k comes from a sort-limit (Spark's
    * TakeOrdered — no full sort materializes); previous-window ranks
    * are computed ONLY for those k items, each as a broadcast
    * count-of-better (count items with a strictly better
    * (count, id)) — k·|items| predicate evaluations map-side, never a
    * window over the item universe.
    */
  def trendingDelta(df: DataFrame, itemCol: String, tsCol: String,
      splitIso: String, k: Int = 20): DataFrame = {
    val split = lit(splitIso).cast("timestamp")
    val items = df
      .where(col(itemCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(itemCol).as("item"))
      .agg(
        sum(when(col(tsCol) < split, 1L).otherwise(0L)).as("cnt_prev"),
        sum(when(col(tsCol) >= split, 1L).otherwise(0L)).as("cnt_cur"))
      .localCheckpoint() // top-k cut and rank probes share it
    val cur = items.where(col("cnt_cur") > 0)
      .orderBy(col("cnt_cur").desc, col("item")).limit(k)
    val prevNZ = items.where(col("cnt_prev") > 0)
      .select(col("item").as("p2"), col("cnt_prev").as("c2"))
    // rank-of-better: stream the previous-window item table once
    // against the k broadcast probes, counting items ahead of each
    // probe in (count desc, item) order — map-side, no item sort
    val better = prevNZ.join(broadcast(cur.select(col("item").as("probe"),
        col("cnt_prev").as("pc"))),
        col("c2") > col("pc") || (col("c2") === col("pc") &&
          col("p2") < col("probe")))
      .groupBy(col("probe").as("item"))
      .agg(count(lit(1)).as("better"))
    val w = Window.orderBy(col("cnt_cur").desc, col("item"))
    cur.join(broadcast(better), Seq("item"), "left")
      .withColumn("better", coalesce(col("better"), lit(0L)))
      .withColumn("rank_cur", row_number().over(w).cast("long"))
      .select(col("rank_cur"), col("item"), col("cnt_cur"), col("cnt_prev"),
        when(col("cnt_prev") > 0, col("better") + 1L).as("prev_rank"),
        when(col("cnt_prev") > 0, col("better") + 1L - col("rank_cur"))
          .as("rank_delta"),
        (col("cnt_prev") === 0L).as("is_new"))
      .orderBy("rank_cur")
  }
}

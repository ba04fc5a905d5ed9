package graft.ops

import org.apache.spark.sql.DataFrame
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
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation joins. AQE's skew-join handling rebalances
  * oversized *shuffle blocks* after the fact; explicit salting is the
  * planned form — use it when one side has keys hot enough that a
  * single key exceeds an executor (the security-identity case:
  * millions of events for one user ARN joining that user's context
  * row).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key` with the hot side salted S ways:
    * big rows scatter across S sub-keys (deterministic hash of the
    * whole row, so retries are stable), the small side replicates ×S
    * via an in-plan explode. The shuffle then spreads each hot key
    * over S reducers instead of one. Result is exactly the plain
    * inner join — proven by SkewSpec.
    *
    * Cost model: small side grows ×S (keep S modest, 8-32); big side
    * pays no extra data, only a wider key. At 100 TB this is the
    * difference between one straggling reducer and S even ones.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    // deterministic per-row salt: hash every column so identical rows
    // co-locate but a hot key's rows spread uniformly
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val smallReplicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Consistent-hash ring placement audit — measure how many keys a
    * resize from `shardsBefore` to `shardsAfter` shards would MOVE
    * under the ring (each shard owns `vnodes` positions; a key lands
    * on the successor position clockwise) versus naive `hash mod N`
    * placement, per before-shard. The ring's whole point is the
    * contrast this report quantifies: mod-placement reshuffles
    * ~(1 − 1/M) of ALL keys on resize, the ring only the share the
    * new shards take over (≈ added/after) — the difference between a
    * full-corpus rewrite and an incremental handoff when a 100 TB
    * keyed store grows.
    *
    * Deterministic integer arithmetic end to end: positions are
    * `mix31` of seeded shard·vnode / key values, so the oracle
    * replays ring construction and successor choice exactly.
    *
    * Scale shape: the ring is shards×vnodes rows — broadcast; the
    * successor argmin is a per-key fold over that broadcast (map-side,
    * no shuffle of the key stream beyond the final per-shard count).
    */
  def consistentShardDiff(df: DataFrame, keyCol: String,
      shardsBefore: Int, shardsAfter: Int, vnodes: Int = 16): DataFrame = {
    require(shardsBefore >= 1 && shardsAfter >= 1 && vnodes >= 1,
      "shard and vnode counts must be positive")
    import graft.ops.Similarity.mix31Col
    val spark = df.sparkSession
    import spark.implicits._
    def ring(n: Int): DataFrame =
      (0 until n).flatMap(s => (0 until vnodes).map(v => (s, v)))
        .toDF("shard", "v")
        .select(col("shard").cast("long").as("shard"),
          mix31Col(col("shard") * 1000003L + col("v") * 7919L).as("rpos"))
    // successor choice as one argmin: non-wrapped candidates
    // (rpos ≥ kpos) sort before wrapped ones, then by position — the
    // min struct IS the clockwise successor (or the wrap-around min)
    def assign(keys: DataFrame, n: Int, as: String): DataFrame =
      keys.crossJoin(broadcast(ring(n)))
        .groupBy("k")
        .agg(min(struct((col("rpos") < col("kpos")).as("wrapped"),
          col("rpos"), col("shard"))).as("m"))
        .select(col("k"), col("m.shard").as(as))
    val keys = df.select(col(keyCol).cast("long").as("k"))
      .where(col("k").isNotNull).distinct()
      .withColumn("kpos", mix31Col(col("k"))).localCheckpoint()
    val ringMoves = assign(keys, shardsBefore, "before")
      .join(assign(keys, shardsAfter, "after"), "k")
    val modMoves = keys.select(col("k"),
      pmod(col("kpos"), lit(shardsBefore.toLong)).as("mod_before"),
      pmod(col("kpos"), lit(shardsAfter.toLong)).as("mod_after"))
    ringMoves.join(modMoves, "k")
      .groupBy(col("before").as("shard"))
      .agg(count(lit(1)).as("n_keys"),
        sum((col("before") =!= col("after")).cast("long")).as("ring_moved"),
        sum((col("mod_before") =!= col("mod_after")).cast("long"))
          .as("mod_moved"))
      .select(col("shard"), col("n_keys"), col("ring_moved"),
        expr("ring_moved * 1000000 div n_keys").as("ring_moved_ppm"),
        col("mod_moved"),
        expr("mod_moved * 1000000 div n_keys").as("mod_moved_ppm"))
      .orderBy("shard")
  }
}

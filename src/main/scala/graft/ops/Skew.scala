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
}

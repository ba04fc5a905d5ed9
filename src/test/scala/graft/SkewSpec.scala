package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted equi-join equals the plain join on skewed keys") {
    val rnd = new scala.util.Random(7)
    // 90% of rows on one hot key
    val big = (1 to 5000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 1L else rnd.nextInt(100).toLong
      (k, i.toLong)
    }.toDF("k", "payload")
    val small = (0L to 99L).map(k => (k, s"ctx$k")).toDF("k", "ctx")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "ctx").orderBy("k", "payload").collect()
    val salted = Skew.saltedEquiJoin(big, small, "k", salts = 8)
      .select("k", "payload", "ctx").orderBy("k", "payload").collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (s, p) => assert(s === p) }
  }

  test("salt spreads a hot key across sub-keys, replication is exact") {
    val big = Seq.fill(1000)((1L, "x")).toDF("k", "v")
      .withColumn("v", concat(col("v"), monotonically_increasing_id()))
    val small = Seq((1L, "ctx")).toDF("k", "ctx")
    val joined = Skew.saltedEquiJoin(big, small, "k", salts = 8)
    assert(joined.count() === 1000)
    // the internal salt must actually distribute: re-derive it the
    // same way and count distinct sub-keys for the hot key
    val salts = big.select(
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).as("s"))
      .distinct().count()
    assert(salts >= 6, s"expected the hot key spread over most of 8 salts, got $salts")
  }

  test("consistentShardDiff: no-op resize moves nothing; ring beats mod on grow") {
    import spark.implicits._
    val keys = (1L to 200L).toDF("k")
    val same = graft.ops.Skew.consistentShardDiff(keys, "k", 4, 4)
      .collect()
    assert(same.nonEmpty)
    assert(same.forall(_.getAs[Long]("ring_moved") === 0L))
    assert(same.forall(_.getAs[Long]("mod_moved") === 0L))
    // grow 2 → 3: mod reshuffles ~2/3 of keys, the ring only the
    // share the new shard takes (~1/3) — the property the op audits
    val grow = graft.ops.Skew.consistentShardDiff(keys, "k", 2, 3)
      .collect()
    val ring = grow.map(_.getAs[Long]("ring_moved")).sum
    val mod = grow.map(_.getAs[Long]("mod_moved")).sum
    assert(ring < mod, s"ring moved $ring, mod moved $mod")
    assert(grow.map(_.getAs[Long]("n_keys")).sum === 200L)
    // shards are the declared before-space
    assert(grow.forall(r => r.getAs[Long]("shard") >= 0L &&
      r.getAs[Long]("shard") < 2L))
  }
}

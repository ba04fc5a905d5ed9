package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DocDedup, Similarity}

/** Differential specs for the native codegen'd expressions in
  * graft.functions.VectorExpressions: each must be bit-identical to
  * the interpreted higher-order-function fold it replaces, on real
  * testdata rows — these folds are the executable semantics spec.
  */
class VecExprSpec extends AnyFunSuite with SparkSuite {

  test("vec_dot matches the aggregate(zip_with) fold bit-for-bit") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val foldDot = aggregate(
      zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = e.select(col("vec_id"),
        call_function("vec_dot", col("v"), col("v")).as("native"),
        foldDot.as("fold"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"vec_id=${r.get(0)}")
    }
  }

  test("vec_dot null semantics: length mismatch and null element → null") {
    val df = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d)) AS mismatch,
        |       vec_dot(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS nullelem,
        |       vec_dot(array(), array()) AS empty""".stripMargin)
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) === 0.0)
  }

  test("simhash64 matches the explode + 64-sum-column aggregate") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    // reference fold: the portable token-hash semantics restated with
    // interpreted HOFs — base-31 polyhash over code points (q38's
    // fold), one mix31 whitening step, then per-bit mix31 sign votes
    val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", aggregate(
        transform(split(col("w"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => (acc * 31 + c) % 2147483647L))
      .withColumn("y", Similarity.mix31Col(col("h")))
    val votes = (0 until 64).map(b =>
      sum(when(Similarity.mix31Col(col("y") + b) >= 1073741824L,
        lit(1)).otherwise(lit(-1))).as(s"v$b"))
    val agg = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
    val bitsum = (0 until 64).map(b =>
      when(col(s"v$b") >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val ref = agg.select(col("doc_id"), bitsum.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs.select(col("doc_id"),
        call_function("simhash64", split(col("text"), " ")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size === ref.size)
    ref.foreach { case (id, v) => assert(native(id) === v, s"doc_id=$id") }
  }

  test("shingle_hashes matches distinct xxhash64 over HOF shingles") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val ref = docs.select(col("doc_id"),
        explode(DocDedup.shingles(col("text"), 3)).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("s"))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs.select(col("doc_id"),
        call_function("shingle_hashes", split(col("text"), " "), lit(3)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // docs shorter than n words are absent from the explode side but
    // present (empty) on the native side
    ref.foreach { case (id, hs) => assert(native(id) === hs, s"doc_id=$id") }
    native.filterNot { case (id, _) => ref.contains(id) }
      .foreach { case (_, hs) => assert(hs.isEmpty) }
  }

  test("sorted_intersect_count matches size(array_intersect) on shingle sets") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(60)
    val hs = docs.select(col("doc_id"),
        call_function("shingle_hashes", split(col("text"), " "), lit(3))
          .as("hs"))
    val pairs = hs.as("a").join(hs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        size(array_intersect(col("a.hs"), col("b.hs"))).cast("long")
          .as("ref"),
        call_function("sorted_intersect_count", col("a.hs"), col("b.hs"))
          .as("fast"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r =>
      assert(r.getLong(2) === r.getLong(3),
        s"pair ${r.getLong(0)},${r.getLong(1)}"))
  }

  test("minhash_state sig matches the k min-aggregates over explode") {
    val numHashes = 16
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    // portable reference: per shingle, base-37 fold → one mix31
    // whitening step → per-permutation mix31 values, min-aggregated
    // (h62 mod 2^31 is exactly the base-37 fold, so the whitening
    // input is h37)
    val shRows = docs.select(col("doc_id"),
        explode(DocDedup.shingles(col("text"), 3)).as("s"))
      .withColumn("h37", aggregate(
        transform(split(col("s"), ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => (acc * 37 + c) % 2147483647L))
      .withColumn("y", Similarity.mix31Col(col("h37")))
    val mins = (0 until numHashes).map(i =>
      min(Similarity.mix31Col(col("y") + i)).as(s"m$i"))
    val ref = shRows.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val st = call_function("minhash_state", split(col("text"), " "), lit(3), lit(numHashes))
    val native = docs.select(col("doc_id"), st.getField("sig").as("sig"),
        st.getField("sh").as("sh"))
      .where(size(col("sh")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.size === ref.size)
    ref.foreach { case (id, sig) => assert(native(id) === sig, s"doc_id=$id") }
  }

  test("winnow_fp matches the HOF fold fingerprints") {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(200)
    val ref = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.winnowFold(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs.select(col("doc_id"),
        call_function("winnow_fp", col("text"), lit(8), lit(4)).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.size === ref.size)
    ref.foreach { case (id, fp) => assert(native(id) === fp, s"doc_id=$id") }
    // short-text edge: fewer than w k-grams → the single global min
    val short = spark.sql(
      "SELECT winnow_fp('abcdefghij', 8, 4) AS fp").collect()(0).getSeq[Long](0)
    assert(short.length === 1)
  }

  test("srp_bucket matches the HOF fold bucket") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ref = e.select(col("vec_id"), Similarity.srpBucketFold(col("v"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = e.select(col("vec_id"),
        call_function("srp_bucket", col("v"), lit(8)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size === ref.size)
    ref.foreach { case (id, b) => assert(native(id) === b, s"vec_id=$id") }
  }

  test("nearest_cell matches the array_max struct-fold argmax") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
    val cents = graft.ops.Ivf.trainCentroids(e, k = 8, iterations = 1)
    val ref = e.select(col("vec_id"), graft.ops.Ivf.cellOfFold(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = e.select(col("vec_id"), graft.ops.Ivf.cellOf(col("embedding"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native.size === ref.size)
    ref.foreach { case (id, c) => assert(native(id) === c, s"vec_id=$id") }
  }

  test("IntSqrt == the column-program integer sqrt it replaced, and " +
      "the nested fractional power stays inside whole-stage codegen") {
    import spark.implicits._
    // the replaced program, restated: floor(sqrt(double)) + two ±1
    // corrections
    def columnIsqrt(x: org.apache.spark.sql.Column) = {
      val s = floor(sqrt(x.cast("double"))).cast("long")
      val s1 = when((s + 1) * (s + 1) <= x, s + 1).otherwise(s)
      when(s1 * s1 > x, s1 - 1).otherwise(s1)
    }
    // Long.MaxValue sits where the OLD program's (s+1)² probe
    // overflows (ANSI throw) — the kernel clamps and returns the
    // exact root there instead; pinned directly below, excluded from
    // the differential
    val battery: Seq[Long] = (0L to 20L) ++
      Seq(24L, 25L, 26L, 99L, 100L, 101L, 1023L, 1024L, 1025L,
        999999L, 1000000L, 1000001L, (1L << 40) - 1, 1L << 40,
        (1L << 40) + 1, (1L << 62)) ++
      (1 to 50).map(i => math.abs(i * 2654435761L) % (1L << 50))
    assert(graft.functions.VecKernels.isqrt(Long.MaxValue)
      === 3037000499L)
    assert(graft.functions.VecKernels.isqrt(-5L) === -1L)
    // repartition breaks ConvertToLocalRelation, so the expression
    // runs through the real codegen path, not driver-side folding
    val df = battery.toDF("x").repartition(2)
    val r = df.select(col("x"),
        graft.ops.Similarity.isqrtCol(col("x")).as("native"),
        columnIsqrt(col("x")).as("columnar"))
      .collect()
    r.foreach(row => assert(row.getLong(1) === row.getLong(2),
      s"x=${row.getLong(0)}"))
    // exactness: native² ≤ x < (native+1)² wherever squares fit
    r.foreach { row =>
      val x = row.getLong(0); val s = row.getLong(1)
      if (x < (1L << 61)) {
        assert(s * s <= x && (s + 1) * (s + 1) > x, s"x=$x")
      }
    }
    // the q363 weight projection (isqrt(isqrt(f³))) must stay inside
    // ONE whole-stage codegen span — the nested column program used
    // to blow the 64 KB method limit and fall back to interpreted
    val small = df.where(col("x") < (1L << 21)) // cube fits a long
    val nested = small.select(graft.ops.Similarity.isqrtCol(
      graft.ops.Similarity.isqrtCol(col("x") * col("x") * col("x")))
      .as("w"))
    // run first via collect() — the SAME queryExecution (count()
    // plans a separate aggregate) — so AQE finalizes this plan and
    // the codegen spans appear in its string form
    assert(nested.collect().length === small.count())
    // the `*(n)` prefix is the WholeStageCodegen marker in the
    // adaptive plan's string form
    val planStr = nested.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[isqrt".r.findFirstIn(planStr)
      .isDefined, planStr.take(500))
  }

  test("native expressions stay inside whole-stage codegen") {
    val e = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(call_function("vec_dot",
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("d"))
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val codegenNodes = e.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(codegenNodes.nonEmpty,
      s"expected a WholeStageCodegen span:\n${e.queryExecution.executedPlan}")
    // and the expression evaluates correctly through the codegen path
    assert(e.count() > 0)
  }
}

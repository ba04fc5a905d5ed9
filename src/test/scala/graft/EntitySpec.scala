package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Entity

class EntitySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("fuzzySelfJoin pairs same-block names within edit distance") {
    val d = Seq("red bolt", " red bol", "old bolt", "blue gear", "blu gear",
      "red widget").toDF("p_name")
    val r = Entity.fuzzySelfJoin(d, "p_name").collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSeq
    // "red bol" blocks on "bol", not "bolt" — out of contract by the
    // declared blocking policy even though its true distance is 1
    assert(r === Seq(("blu gear", "blue gear", 1), ("old bolt", "red bolt", 2)))
  }

  test("fuzzySelfJoin never pairs across blocks or beyond maxDist") {
    val d = Seq("aaa x", "aab x", "zzz x", "aaa y").toDF("p_name")
    val r = Entity.fuzzySelfJoin(d, "p_name").collect()
      .map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r === Seq(("aaa x", "aab x"))) // "zzz x" is 3 edits away
  }

  test("fuzzyResolve maps each dirty name to its nearest canonical") {
    val dirty = Seq("red blot", "blue gear", "warm gizmo").toDF("name")
    val canon = Seq("red bolt", "blue gear", "hot gear").toDF("name")
    val r = Entity.fuzzyResolve(dirty, canon, "name").collect()
      .map(x => x.getString(0) -> ((x.getString(1), x.getInt(2)))).toMap
    // "red blot" blocks on "blot" — no canonical shares it; dropped
    assert(!r.contains("red blot"))
    assert(r("blue gear") === (("blue gear", 0)))
    assert(!r.contains("warm gizmo")) // gizmo block has no canonical
  }

  test("fuzzyResolve tie-breaks equal distance to the first canonical") {
    val dirty = Seq("aac x").toDF("name")
    val canon = Seq("aab x", "aad x").toDF("name")
    val r = Entity.fuzzyResolve(dirty, canon, "name").collect()
    assert(r.head.getString(1) === "aab x")
  }
}

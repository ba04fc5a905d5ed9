package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite via lazy val).
  *
  * Because every suite resolves the same `getOrCreate()` session, any
  * suite that mutates the session `FunctionRegistry` over a BUILTIN
  * name poisons every later suite (the r7 PlanSpec red: a date_format
  * shadow turned lake partition values into the literal "HH",
  * order-dependently). [[Functions.register]] now refuses builtin
  * names at register time; the `afterAll` canary below is the second
  * line of defense — it fails LOUDLY in whichever suite broke the
  * invariant, instead of some unrelated suite failing later.
  */
trait SparkSuite extends BeforeAndAfterAll { self: AnyFunSuite =>
  @volatile private var sparkStarted = false

  lazy val spark: SparkSession = {
    sparkStarted = true
    Tables.configure(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
  }

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  override def afterAll(): Unit = {
    if (sparkStarted) {
      val r = spark.sql(
        """SELECT date_format(timestamp'2024-01-02 03:04:05', 'HH') AS hh,
          |       from_unixtime(0) AS fu,
          |       size(split('a.b', '.')) AS ns""".stripMargin).head()
      assert(r.getString(0) == "03",
        s"builtin-integrity canary: date_format(ts,'HH') returned " +
          s"'${r.getString(0)}' — this suite (or one it ran after) " +
          "shadowed the Spark builtin date_format in the shared session")
      assert(r.get(1).isInstanceOf[String],
        "builtin-integrity canary: from_unixtime no longer returns " +
          "STRING — the Spark builtin was shadowed in the shared session")
      assert(r.getInt(2) == 4,
        s"builtin-integrity canary: split('a.b','.') returned " +
          s"${r.getInt(2)} parts, not regex semantics — the Spark " +
          "builtin split was shadowed in the shared session")
    }
    super.afterAll()
  }
}

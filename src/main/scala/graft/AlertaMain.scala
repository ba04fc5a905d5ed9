package graft

import org.apache.spark.sql.SparkSession

import graft.engine.Runner
import graft.functions.Dates
import graft.model.AlertSpecs
import graft.store.{AlertStore, InflightStore}

/** CLI entry point — one engine run, the reference's cron-invoked
  * `main` (alerta.py:481-515; cadence startup.sh:24-26 moves to the
  * scheduler invoking this).
  *
  * Usage: AlertaMain <eventsParquet> <specsGlob> <storeDir> [nowIso]
  */
object AlertaMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: AlertaMain <eventsParquet> <specsGlob> <storeDir> [nowIso]")
    val Array(eventsPath, specsMask, storeDir) = args.take(3)
    val now = args.lift(3).map(Dates.toUTC(_)).getOrElse(Dates.utcnow())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lakeNorm = Tables.normalizeTs(spark.read.parquet(eventsPath))
    val specs = AlertSpecs.loadAll(specsMask)
    val runner = new Runner(spark, new AlertStore(storeDir), new InflightStore(storeDir))
    val stats = runner.runOnce(lakeNorm, specs, now)
    println(s"""{"alerts_saved":${stats.alertsSaved},"sequences_completed":${stats.sequencesCompleted},"specs":${specs.size},"inflight":${runner.inflight.count}}""")
    spark.stop()
  }
}

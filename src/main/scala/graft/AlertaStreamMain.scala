package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.model.{AlertDoc, AlertSpecs}
import graft.streaming.StreamingAlerts

/** Streaming CLI entry point — the north-star mode: the same YAML
  * specs the batch Runner consumes, evaluated continuously over a
  * growing events directory with Structured Streaming.
  *
  * Usage:
  *   AlertaStreamMain <eventsDir> <specsGlob> <outDir> [availableNow] [seqEngine]
  *
  * `seqEngine` picks the sequence implementation: `fmgws` (default,
  * [[StreamingAlerts.sequenceStream]]) or `tws` — the N-slot
  * transformWithState chain ([[graft.streaming.StreamingAlertsTws
  * .sequenceStreamTwsN]], RocksDB state store set automatically),
  * the implementation with middle-deadman support, per-key rendered
  * criteria on the emitted alert, and watermark-horizon-bounded
  * state.
  *
  * One streaming query per spec (threshold/deadman/sequence →
  * [[StreamingAlerts]]), each appending alert rows to
  * `<outDir>/<alert_name>` with its own checkpoint under
  * `<outDir>/_checkpoints`. With `availableNow` (the default) each
  * query drains the data currently in the directory and stops —
  * drive-testable and restartable (checkpoints make re-runs
  * incremental); drop the flag for continuous micro-batches.
  *
  * The schema comes from a static read of the same directory —
  * production would pin an explicit schema/catalog table instead of
  * inference.
  */
object AlertaStreamMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: AlertaStreamMain <eventsDir> <specsGlob> <outDir> [availableNow|continuous]")
    val Array(eventsDir, specsMask, outDir) = args.take(3)
    val availableNow = args.lift(3) match {
      case None | Some("availableNow") => true
      case Some("continuous") => false
      case Some(other) => sys.error(
        s"unknown mode '$other' — expected availableNow or continuous")
    }
    val seqEngine = args.lift(4).getOrElse("fmgws")
    require(seqEngine == "fmgws" || seqEngine == "tws",
      s"unknown seqEngine '$seqEngine' — expected fmgws or tws")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dialect functions beyond the textual rewrite resolve in criteria
    graft.functions.Functions.register(spark)

    val schema = spark.read.parquet(eventsDir).schema
    val events = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(eventsDir))
    val specs = AlertSpecs.loadAll(specsMask)

    // duplicate alert_names (or several specs defaulting to "unnamed")
    // must not share a sink/checkpoint — suffix repeats with an index
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val queries = specs.flatMap { spec =>
      val base = AlertDoc.str(spec, "alert_name", "unnamed")
      val dup = seen.updateWith(base)(c => Some(c.getOrElse(0) + 1)).get
      val name = if (dup == 1) base else base + "-" + dup
      val out = AlertDoc.str(spec, "alert_type") match {
        case "threshold" => Some(StreamingAlerts.thresholdStream(events, spec).toDF())
        case "deadman"   => Some(StreamingAlerts.deadmanStream(events, spec).toDF())
        case "sequence" if seqEngine == "tws" =>
          // transformWithState requires the RocksDB provider
          spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          Some(graft.streaming.StreamingAlertsTws
            .sequenceStreamTwsN(events, spec).toDF())
        case "sequence"  => Some(StreamingAlerts.sequenceStream(events, spec).toDF())
        case other =>
          System.err.println(s"[stream] unknown alert_type '$other' for $name — skipped")
          None
      }
      out.map { df =>
        val w = df.writeStream
          .format("parquet")
          .option("path", s"$outDir/$name")
          .option("checkpointLocation", s"$outDir/_checkpoints/$name")
          .outputMode("append")
        (name, (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start())
      }
    }

    queries.foreach { case (name, q) =>
      q.awaitTermination()
      println(s"""{"stream":"$name","done":true}""")
    }
    spark.stop()
  }
}

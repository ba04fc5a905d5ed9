package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming front door for the training-data pipeline ops: the batch
  * operators in [[graft.ops.DocDedup]] assume a materialized corpus;
  * these are their ingest-time twins over an unbounded document
  * stream.
  *
  * Scale stance (100 TB/day ingest):
  *   - exact dedup keys state by a 16-byte content hash, never the
  *     document, and `dropDuplicatesWithinWatermark` evicts state as
  *     the watermark passes — state is O(unique docs per watermark
  *     window), not O(stream).
  *   - fingerprint tagging (simhash / minhash signature) is stateless
  *     map-only via the native codegen'd kernels, so it runs at full
  *     ingest parallelism with zero shuffle; downstream batch LSH
  *     banding consumes the persisted signatures without re-reading
  *     text.
  */
object StreamingPipeline {

  /** Exact-dup suppression on a document stream: first arrival of each
    * content hash within the watermark horizon passes through,
    * duplicates are dropped. The hash column is added (and kept) so
    * the sink can audit what keyed the state.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", delay: String = "10 minutes"): DataFrame =
    docs.withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Stream → lake: land events hive-partitioned by UTC hour, the
    * write side of the reference's firehose→Athena layout
    * (startup.sh) on the live path. The layout prep is
    * [[graft.sources.Lake.partitionedByHour]] — the SAME code the
    * batch writer uses — so the batch alert engine's 2-hour window
    * prunes streamed data identically and null-ts rows drop the same
    * way (dead-letter parity).
    *
    * Small-file note: each microbatch writes one file per in-batch
    * hour per writing task, so micro-batch cadence is the file-count
    * knob — pass a `Trigger.ProcessingTime` sized so one batch holds
    * minutes of data (or `Trigger.AvailableNow` for a drain). Do NOT
    * rewrite this directory with batch `Lake.write`: the streaming
    * sink's `_spark_metadata` log is the source of truth for readers,
    * and out-of-band rewrites orphan or hide files; compaction of a
    * streamed lake means draining it into a NEW directory.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def toLake(events: DataFrame, dir: String, checkpointDir: String,
      tsCol: String = "ts",
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = graft.sources.Lake.partitionedByHour(events, tsCol)
      .writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(graft.sources.Lake.partitionCols: _*)
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Stateless in-stream fingerprinting: attach simhash + MinHash
    * signature per document via the native kernels (pure projection —
    * safe in any output mode, no state, no watermark needed).
    */
  def fingerprintStream(docs: DataFrame, textCol: String = "text",
      shingleN: Int = 3, numHashes: Int = 16): DataFrame = {
    val words: Column = split(col(textCol), " ")
    val mh = call_function("minhash_state", words, lit(shingleN), lit(numHashes))
    docs
      .withColumn("simhash", call_function("simhash64", words))
      // docs shorter than shingleN words have no signature: persist
      // NULL, not the empty-set sentinel — a stored sentinel would
      // band-match every other short doc when batch LSH consumes the
      // signature table
      .withColumn("minhash_sig",
        when(size(mh.getField("sh")) > 0, mh.getField("sig")))
  }
}

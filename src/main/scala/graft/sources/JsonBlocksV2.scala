package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for brace-concatenated JSON-block files —
  * the reference's raw log shape (S13, utils/helpers.py tokenizer;
  * CloudTrail-style delivery drops many JSON objects back to back
  * with no delimiter). `spark.read.format("graft.sources
  * .JsonBlocksSource").load(dir)` yields one row per JSON OBJECT
  * (`block` string + `src_file` provenance), ready for
  * `spark.read.json` / `from_json` downstream — no driver-side
  * tokenize, no wholetext-then-flatMap detour.
  *
  * Ladder step beyond (c): a connector, not an operator — the
  * brace-balance split (Ingest.splitJsonBlocks, string-aware) runs
  * INSIDE each PartitionReader, so tokenization distributes with the
  * files. The file is the parallelism unit by construction: a block
  * boundary is only known after balancing every brace before it, so
  * byte-range splits would shred objects (same reason the wholetext
  * read existed). At 100 TB that is the right contract for this
  * format — delivery drops are many small-to-medium files, and a
  * 1000-executor cluster scales out on file count.
  */
class JsonBlocksSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonBlocksSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new JsonBlocksTable(properties.get("path"))
}

object JsonBlocksSource {
  val Schema: StructType = StructType(Seq(
    StructField("block", StringType, nullable = false),
    StructField("src_file", StringType, nullable = false)))

  /** The active session's Hadoop configuration (spark.hadoop.* keys
    * applied), captured DRIVER-side at plan/write-build time so
    * executors see the same object-store credentials and endpoints
    * the session was configured with. Falls back to a bare
    * Configuration when no session is active (tests constructing
    * readers directly).
    */
  private[sources] def sessionHadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Leaf data files under `path` (a file, directory or glob),
    * skipping hidden/metadata entries — one InputPartition each.
    */
  private[sources] def leafFiles(path: String,
      conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val roots = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    roots.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
    }.filter(_.isFile)
      .map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.toString)
      .sorted
  }
}

private[sources] class JsonBlocksTable(path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"jsonblocks($path)"
  override def schema(): StructType = JsonBlocksSource.Schema
  // no TRUNCATE: the WriteBuilder is append-shaped (task-commit
  // rename, last attempt wins per partition file); declaring TRUNCATE
  // without SupportsTruncate let mode("overwrite") pass the
  // capability check only to fail at write planning
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        new JsonBlocksScan(Option(path).getOrElse(options.get("path")))
    }

  /** Write side: each task concatenates its `block` strings into one
    * delivery-drop file (the format IS concatenation — no delimiter
    * to add), written task-temporary and renamed on task commit so a
    * failed/speculative task never publishes a partial file. The
    * block column is resolved BY NAME (`block`, case-insensitive) —
    * binding the first string column by position would silently write
    * the wrong column for a frame ordered e.g. (src_file, block).
    * Position is the fallback only when no column is named `block`
    * AND exactly one string column exists (unambiguous).
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val fields = info.schema().fields
    val byName = fields.indexWhere(f =>
      f.name.equalsIgnoreCase("block") && f.dataType == StringType)
    val stringIdxs = fields.indices.filter(fields(_).dataType == StringType)
    val blockIdx =
      if (byName >= 0) byName
      else if (stringIdxs.size == 1) stringIdxs.head
      else throw new IllegalArgumentException(
        "jsonblocks write needs a string column named 'block', or " +
          s"exactly one string column; got schema ${info.schema().sql}")
    val target = Option(path)
      .getOrElse(info.options.get("path"))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new JsonBlocksBatchWrite(
          target, blockIdx, info.queryId(),
          new SerializableConfiguration(
            JsonBlocksSource.sessionHadoopConf()))
      }
    }
  }
}

private[sources] class JsonBlocksBatchWrite(path: String, blockIdx: Int,
    queryId: String, hadoopConf: SerializableConfiguration)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new JsonBlocksWriterFactory(path, blockIdx, queryId, hadoopConf)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class JsonBlocksCommit(file: String)
    extends WriterCommitMessage

private[sources] class JsonBlocksWriterFactory(path: String, blockIdx: Int,
    queryId: String, hadoopConf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val dir = new Path(path)
    private val fs = dir.getFileSystem(hadoopConf.value)
    private val tmp = new Path(dir,
      f".${queryId}_$partitionId%05d-$taskId.json.tmp")
    private val fin = new Path(dir, f"part-$partitionId%05d.json")
    private lazy val out = { fs.mkdirs(dir); fs.create(tmp, true) }

    override def write(record: InternalRow): Unit =
      out.write(record.getUTF8String(blockIdx).getBytes)

    override def commit(): WriterCommitMessage = {
      out.close()
      // task commit = atomic publish; last attempt wins (overwrite)
      if (fs.exists(fin)) fs.delete(fin, false)
      fs.rename(tmp, fin)
      JsonBlocksCommit(fin.toString)
    }

    override def abort(): Unit = {
      try out.close() catch { case _: Throwable => () }
      fs.delete(tmp, false): Unit
    }

    override def close(): Unit = ()
  }
}

private[sources] class JsonBlocksScan(path: String) extends Scan with Batch {
  // session Hadoop conf captured at plan time (see WarcScan): a fresh
  // Configuration() on executors would drop every spark.hadoop.* key
  private val hadoopConf =
    new SerializableConfiguration(JsonBlocksSource.sessionHadoopConf())

  override def readSchema(): StructType = JsonBlocksSource.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    JsonBlocksSource.leafFiles(path, hadoopConf.value)
      .map(JsonBlocksPartition(_): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonBlocksReaderFactory(hadoopConf)
}

private[sources] case class JsonBlocksPartition(file: String)
    extends InputPartition

private[sources] class JsonBlocksReaderFactory(
    hadoopConf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[JsonBlocksPartition].file
    new PartitionReader[InternalRow] {
      // whole-file read is the format's contract (see class doc); the
      // tokenizer is the SAME string-aware brace balancer the S13
      // surface uses, so the two paths can never disagree
      private lazy val blocks: Iterator[String] = {
        val p = new Path(file)
        val fs = p.getFileSystem(hadoopConf.value)
        val in = fs.open(p)
        try {
          val len = fs.getFileStatus(p).getLen
          // whole-file materialization is the documented contract;
          // a >2 GiB delivery file would wrap the Int and silently
          // truncate — fail loudly instead
          require(len <= Int.MaxValue,
            s"jsonblocks file $file is $len bytes — the whole-file " +
              "brace-balance contract caps a single delivery file at " +
              "2 GiB; split the drop upstream")
          val bytes = new Array[Byte](len.toInt)
          in.readFully(bytes)
          Ingest.splitJsonBlocks(
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
            .iterator
        } finally in.close()
      }
      private var current: String = _

      override def next(): Boolean =
        if (blocks.hasNext) { current = blocks.next(); true } else false

      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current),
          UTF8String.fromString(file))

      override def close(): Unit = ()
    }
  }
}

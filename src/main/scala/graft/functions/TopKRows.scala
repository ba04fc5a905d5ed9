package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k-per-group aggregate: keeps the k smallest input
  * structs by the struct's natural (lexicographic) ordering, returned
  * as a sorted array.
  *
  * This is the scale-correct form of "top-N rows per group". The two
  * stock Spark spellings both break down at 100 TB:
  *
  *   - `row_number().over(partitionBy(key))` shuffles EVERY row to its
  *     key's partition before discarding all but k — the shuffle is
  *     O(input), and a hot key concentrates its whole partition on one
  *     task (SURVEY.md §7.4's `collect_list` memory note).
  *   - `collect_list` + `slice` caps the output but still buffers every
  *     row of a group in the aggregation state first.
  *
  * A TypedImperativeAggregate instead participates in partial
  * aggregation: each map task keeps at most k rows per group in a
  * bounded heap, so the shuffle carries O(groups × k) rows no matter
  * how skewed the input, and no state ever exceeds k rows. Encode
  * "descending" orderings by negating the field (see q41).
  *
  * Registered as `topk_rows(struct, k)` by [[GraftExtensions]].
  */
case class TopKRows(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  require(k > 0, "topk_rows: k must be positive")

  private lazy val rowSchema: StructType = child.dataType match {
    case s: StructType => s
    case other => throw new IllegalArgumentException(
      s"topk_rows expects a struct input, got ${other.simpleString(10)}")
  }

  // Interpreted lexicographic ordering over the struct fields; max-heap
  // so the largest retained row is O(1) to inspect and evict.
  private lazy val ord: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[InternalRow]]

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(ord)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) {
        buf.enqueue(row.copy())
      } else if (ord.lt(row, buf.head)) {
        buf.dequeue()
        buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (ord.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(row) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).asInstanceOf[Array[Any]])

  // Buffers ship between partial and final aggregation as
  // length-prefixed UnsafeRow bytes: [n][len row_bytes]*
  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(rowSchema)
    val rows = buf.toArray.map(r => proj(r).copy().getBytes)
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(rows.length)
    rows.foreach { b => dos.writeInt(b.length); dos.write(b) }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val b = new Array[Byte](len)
      dis.readFully(b)
      val row = new UnsafeRow(rowSchema.length)
      row.pointTo(b, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

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
  * This is the bounded-state form of "top-N rows per group", vs the
  * two stock Spark spellings:
  *
  *   - `row_number().over(partitionBy(key))` + `rn <= k`: since Spark
  *     3.5 the optimizer inserts a partial `WindowGroupLimit`, so the
  *     shuffle already carries ≤ k rows per group per map task — but
  *     only after fully SORTING every input partition (O(n log n) per
  *     partition, twice: map side and reduce side).
  *   - `collect_list` + `slice` caps the output but buffers every row
  *     of a group in the aggregation state first (SURVEY.md §7.4's
  *     memory note) — unbounded state under skew.
  *
  * A TypedImperativeAggregate instead keeps at most k rows per group
  * in a bounded heap: O(n log k) with no sort of the input at all,
  * state never exceeds k rows regardless of skew, the shuffle carries
  * O(groups × k), and — unlike the window form — the result arrives as
  * a grouped array composable with sibling aggregates (count, sum,
  * HLL) in the SAME aggregation pass — the shape alert event sampling
  * (G4) needs once a lake stops capping scans at LIMIT 1000. Encode "descending" orderings by
  * negating the field (see q41).
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

  // one compiled projection per task-side expression instance, NOT per
  // serialized group — serialize() runs once per group per flush
  @transient private lazy val proj: UnsafeProjection = UnsafeProjection.create(rowSchema)

  // Buffers ship between partial and final aggregation as
  // length-prefixed UnsafeRow bytes: [n][len row_bytes]*
  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
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

package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** SQL-equality key discipline for the map-building aggregates: the
  * buffers key on boxed JVM equality, where `-0.0` and `0.0` are TWO
  * keys (`java.lang.Double.equals` compares bits), but SQL equality —
  * and the collect/sort shims these replaced, which rode Spark's
  * `NormalizeFloatingNumbers` discipline — merges them. Keys are
  * normalized ON ENTRY (update only: merge and deserialize both
  * consume buffers whose keys already passed through update, so one
  * chokepoint is provably total), recursing through nested arrays and
  * structs. NaN needs no rewrite — boxed `NaN.equals(NaN)` is true,
  * matching SQL. Values are left untouched: the shims collected raw
  * values, so `-0.0` VALUES surviving verbatim is the parity shape.
  */
private[functions] object FloatKeyNorm {
  def containsFloat(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case ArrayType(et, _) => containsFloat(et)
    case StructType(fields) => fields.exists(f => containsFloat(f.dataType))
    case MapType(k, v, _) => containsFloat(k) || containsFloat(v)
    case _ => false
  }

  /** `-0.0` → `0.0` at every float/double position; non-float shapes
    * pass through by reference (no copy tax on the common path).
    */
  def normalize(v: Any, dt: DataType): Any =
    if (v == null) null else dt match {
      case DoubleType =>
        // d == 0.0 is true for -0.0 too; rebox the canonical zero
        val d = v.asInstanceOf[Double]
        if (d == 0.0d) java.lang.Double.valueOf(0.0d) else v
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f == 0.0f) java.lang.Float.valueOf(0.0f) else v
      case ArrayType(et, _) if containsFloat(et) =>
        val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(et)
        new GenericArrayData(a.map(normalize(_, et)))
      case StructType(fields) if fields.exists(f => containsFloat(f.dataType)) =>
        val r = v.asInstanceOf[InternalRow]
        val out = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          out(i) = normalize(r.get(i, fields(i).dataType), fields(i).dataType)
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      case _ => v
    }
}

/** One-pass map-building aggregates for the Presto dialect surface —
  * `histogram(x)` and `multimap_agg(k, v)`.
  *
  * The thirteenth-tranche shims expressed these as
  * `collect_list` → sort → per-distinct-key `ArrayFilter` inside an
  * `ArrayTransform`: correct at criteria scale, but O(n·distinct)
  * per group (the collected array re-scans once per key), and the
  * generated regroup projection blows Janino's 64 KB method limit on
  * wide plans (observed: `Code grows beyond 64 KB` → interpreted
  * fallback in the q413 bench log). These TypedImperativeAggregates
  * build the map in ONE pass with map-side partial aggregation — the
  * buffer is a hash map of exact counts / value buffers, merged
  * across partitions, so per-group cost is O(n) and shuffle volume is
  * the distinct-key set, not the row set.
  *
  * Output parity with the shims is pinned by FunctionsSpec: map
  * entries in ascending key order, multimap value arrays ascending
  * by value (the shims sorted the collected array, so both orders
  * fell out of the sort), null inputs skipped by histogram, null
  * values kept by multimap, null map KEYS rejected loudly (Presto:
  * "map key cannot be null"; the shims hit the same wall inside
  * MapFromEntries). Empty input → empty map, like the shims
  * (MapFromEntries over an empty transform).
  *
  * Reference: Presto aggregate functions histogram / multimap_agg
  * (prestodb docs); the criteria dialect surface of SURVEY §2.2.
  */
case class HistogramAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)
  override def prettyName: String = "histogram"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val floatKeys: Boolean =
    FloatKeyNorm.containsFloat(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // values from reused row buffers must be copied before keying;
      // float keys normalize -0.0 → 0.0 (SQL equality, see FloatKeyNorm)
      val k0 = InternalRow.copyValue(v)
      val k = if (floatKeys) FloatKeyNorm.normalize(k0, child.dataType) else k0
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val keys = buf.keys.toArray.sorted(keyOrdering)
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(keys.map(buf)))
  }

  @transient private lazy val ser = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false),
      ArrayType(LongType, containsNull = false)))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val ks = new Array[Any](buf.size)
    val cs = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, c) => ks(i) = k; cs(i) = c; i += 1 }
    ser(InternalRow(new GenericArrayData(ks),
      new GenericArrayData(cs))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val ks = row.getArray(0).toObjectArray(child.dataType)
    val cs = row.getArray(1).toLongArray()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < ks.length) {
      buf.update(InternalRow.copyValue(ks(i)), cs(i))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `multimap_agg(k, v)` — map key → ascending array of every value
  * seen under it (see [[HistogramAgg]]'s class doc for the shape and
  * parity contract).
  */
case class MultimapAgg(left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, mutable.ArrayBuffer[Any]]] {

  private type Buf = mutable.HashMap[Any, mutable.ArrayBuffer[Any]]

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(left.dataType,
    ArrayType(right.dataType, containsNull = true),
    valueContainsNull = false)
  override def prettyName: String = "multimap_agg"

  override def checkInputDataTypes(): TypeCheckResult = {
    val k = TypeUtils.checkForOrderingExpr(left.dataType, prettyName)
    if (k.isFailure) k
    else TypeUtils.checkForOrderingExpr(right.dataType, prettyName)
  }

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(left.dataType)
  // the shims sorted collected (k, v) structs, so value arrays come
  // out value-ascending with NULL values FIRST (struct ordering:
  // nulls first within equal keys)
  @transient private lazy val valueOrdering: Ordering[Any] = {
    val base = TypeUtils.getInterpretedOrdering(right.dataType)
    (a: Any, b: Any) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else base.compare(a, b)
  }

  @transient private lazy val floatKeys: Boolean =
    FloatKeyNorm.containsFloat(left.dataType)

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  override def update(buf: Buf, input: InternalRow): Buf = {
    val k0 = left.eval(input)
    if (k0 == null) throw new IllegalArgumentException(
      "multimap_agg: map key cannot be null")
    // float keys normalize -0.0 → 0.0 (SQL equality, see FloatKeyNorm);
    // VALUES stay verbatim — the shims collected raw values
    val k1 = InternalRow.copyValue(k0)
    val k = if (floatKeys) FloatKeyNorm.normalize(k1, left.dataType) else k1
    val v = InternalRow.copyValue(right.eval(input))
    buf.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (k, vs) =>
      buf.getOrElseUpdate(k, mutable.ArrayBuffer.empty) ++= vs
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val keys = buf.keys.toArray.sorted(keyOrdering)
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(keys.map(k =>
        new GenericArrayData(buf(k).toArray.sorted(valueOrdering)))))
  }

  @transient private lazy val ser = UnsafeProjection.create(
    Array[DataType](ArrayType(left.dataType, containsNull = false),
      ArrayType(ArrayType(right.dataType, containsNull = true),
        containsNull = false)))

  override def serialize(buf: Buf): Array[Byte] = {
    val ks = new Array[Any](buf.size)
    val vs = new Array[Any](buf.size)
    var i = 0
    buf.foreach { case (k, b) =>
      ks(i) = k; vs(i) = new GenericArrayData(b.toArray); i += 1
    }
    ser(InternalRow(new GenericArrayData(ks),
      new GenericArrayData(vs))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val ks = row.getArray(0).toObjectArray(left.dataType)
    val vs = row.getArray(1)
    val buf: Buf = mutable.HashMap.empty
    var i = 0
    while (i < ks.length) {
      val arr = vs.getArray(i).toObjectArray(right.dataType)
      val b = mutable.ArrayBuffer.empty[Any]
      arr.foreach(v => b += InternalRow.copyValue(v))
      buf.update(InternalRow.copyValue(ks(i)), b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MultimapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MultimapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

import graft.functions.TopKRows

/** Optimizer rule: rewrite the canonical top-k-per-group window —
  *
  * {{{ Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o) AS rn, child)) }}}
  *
  * — into the bounded-heap [[TopKRows]] aggregate + posexplode. The
  * stock plan (even with Spark's own `WindowGroupLimit` partial
  * limits) SORTS every input partition on both sides of the shuffle;
  * the aggregate form keeps at most k rows of state per group,
  * O(n log k), with partial aggregation capping the shuffle at
  * k rows/group/task — the difference between "sort 100 TB twice"
  * and "fold it once" (ladder step (c): a `Rule[LogicalPlan]`
  * injected through `SparkSessionExtensions`, used where composition
  * can't express the plan improvement).
  *
  * Deliberately narrow trigger — the rewrite must be provably
  * semantics-preserving, so it requires ALL of:
  *   - exactly one window expression, and it is `row_number()`;
  *   - non-empty partition spec of plain attributes;
  *   - every sort order either Ascending + NullsFirst (the
  *     interpreted struct ordering [[TopKRows]] uses is
  *     ascending-nulls-first) or Descending + NullsLast over an
  *     INTEGRAL attribute the child's constraints prove non-null —
  *     reversed losslessly as `-1 − x`, the two's-complement
  *     order-reversing bijection with no `Long.MinValue` overflow
  *     (floats are excluded: NaN sorts greatest under either sign,
  *     so negation cannot reverse it);
  *   - the filter is `rn <= lit` / `rn < lit` / `rn = 1` over the
  *     window's own rank attribute, with nothing else conjoined.
  *
  * Under row_number's tie nondeterminism the rewrite picks the
  * tie-break deterministically (full packed-struct order) — a valid
  * row_number assignment, same rows when the sort order is total.
  * `spark.graft.topkRewrite=false` disables the rule at runtime.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rn.exprId && k >= 1 => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rn.exprId && k >= 2 => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.exprId == rn.exprId => Some(1)
      case _ => None
    }

  /** The heap-order key for one sort spec, or None if this spec can't
    * be expressed in the ascending-nulls-first struct ordering.
    */
  private def heapKey(o: SortOrder, child: LogicalPlan): Option[Expression] =
    (o.direction, o.nullOrdering) match {
      case (Ascending, NullsFirst) => Some(o.child)
      case (Descending, NullsLast) => o.child match {
        case a: AttributeReference
          if Seq(org.apache.spark.sql.types.ByteType,
              org.apache.spark.sql.types.ShortType,
              org.apache.spark.sql.types.IntegerType,
              org.apache.spark.sql.types.LongType).contains(a.dataType) &&
            child.constraints.exists {
              case IsNotNull(x: Attribute) => x.exprId == a.exprId
              case _ => false
            } =>
          // -1 - x: order-reversing bijection on two's complement,
          // no overflow at Long.MinValue (unlike unary minus)
          Some(Subtract(Cast(Literal(-1L), a.dataType), a))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString("spark.graft.topkRewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(
            WindowExpression(_: RowNumber, WindowSpecDefinition(_, _, _)), _)),
            partSpec, orderSpec, winChild, _))
          if partSpec.nonEmpty &&
            partSpec.forall(_.isInstanceOf[AttributeReference]) &&
            orderSpec.nonEmpty &&
            orderSpec.forall(o => heapKey(o, winChild).isDefined) &&
            limitOf(cond, alias.toAttribute).isDefined => {
        val k = limitOf(cond, alias.toAttribute).get
        // Spark's InferWindowGroupLimit may already have slid its
        // partial-limit node under the Window — the aggregate form
        // subsumes it (and keeping it would reintroduce the sort)
        val child = winChild match {
          case wgl: WindowGroupLimit => wgl.child
          case other => other
        }
        val partAttrs = partSpec.map(_.asInstanceOf[AttributeReference])
        // packed struct: sort keys first (they decide the heap order),
        // the full row nested last (deterministic tie-break + payload)
        val packed = CreateNamedStruct(
          orderSpec.zipWithIndex.flatMap { case (o, i) =>
            Seq(Literal(s"__o$i"), heapKey(o, winChild).get)
          } ++ Seq(Literal("__row"),
            CreateNamedStruct(child.output.flatMap(a =>
              Seq(Literal(a.name), a)))))
        val aggFn = TopKRows(packed, k).toAggregateExpression()
        val aggOut = Alias(aggFn, "__topk")()
        val agg = Aggregate(partAttrs, partAttrs :+ aggOut, child)
        val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
        val colAttr = AttributeReference("__col", packed.dataType,
          nullable = false)()
        val gen = Generate(PosExplode(aggOut.toAttribute), Nil,
          outer = false, None, Seq(posAttr, colAttr), agg)
        val rowIdx = orderSpec.size // __row sits after the sort keys
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(
            GetStructField(colAttr, rowIdx, Some("__row")), i, Some(a.name)),
            a.name)(exprId = a.exprId)
        }
        val rnOut = Alias(Add(posAttr, Literal(1)),
          alias.name)(exprId = alias.exprId)
        Project(restored :+ rnOut, gen)
      }
    }
  }
}

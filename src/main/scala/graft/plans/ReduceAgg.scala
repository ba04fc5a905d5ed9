package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, DataType}

// This file lives in the org.apache.spark.sql.graft visibility
// subpackage (the ColumnBridge convention) ONLY because the
// HigherOrderFunction binding API exposes private[sql] types
// (AbstractDataType / AnyDataType) in its method signatures — an
// expression that binds SQL lambdas cannot be written outside an
// org.apache.spark.sql subpackage. No Spark internals are
// reimplemented; the aggregate follows graft.functions.MapAggregates'
// TypedImperativeAggregate pattern.

/** Presto `reduce_agg(inputValue, initialState, inputFunction,
  * combineFunction)` — the dialect's arbitrary-fold aggregate, and the
  * ledger's last bucket-(c) exclusion, built on this file's
  * TypedImperativeAggregate plumbing: the state is ONE value of the
  * initial state's type; `update` folds each non-null input through
  * `inputFunction(state, value)`, `merge` folds partial states
  * through `combineFunction(s1, s2)` — both user SQL lambdas, bound
  * through the standard `HigherOrderFunction` resolution (the same
  * machinery `transform`/`aggregate` use) and evaluated by setting
  * the bound `NamedLambdaVariable` slots per call.
  *
  * Contracts (Presto parity, pinned by CriteriaSpec):
  *   - `initialState` must be a constant (Presto: "initialState must
  *     be a static value"); typed analysis failure otherwise;
  *   - both lambdas must return the state type, and may reference
  *     ONLY their lambda variables — a captured column would make
  *     `combineFunction` (which runs at merge time, with no input
  *     row) undefined, so both reject at analysis;
  *   - null input VALUES are skipped (`inputFunction` is invoked for
  *     each non-null value); a null STATE produced by a lambda is
  *     legal and carried.
  *
  * Scale shape: one scalar state per group (constant memory), folds
  * combine map-side like any partial aggregate, state serializes as
  * one single-field UnsafeRow. Reference: Presto docs, aggregate
  * functions — reduce_agg.
  */
case class ReduceAgg(input: Expression, initialState: Expression,
    inputFunc: Expression, combineFunc: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Any] with HigherOrderFunction {

  private def stateType: DataType = initialState.dataType

  override def arguments: Seq[Expression] = Seq(input, initialState)
  override def argumentTypes: Seq[AbstractDataType] =
    Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFunc, combineFunc)
  override def functionTypes: Seq[AbstractDataType] =
    Seq(AnyDataType, AnyDataType)
  override def children: Seq[Expression] = arguments ++ functions

  override def dataType: DataType = stateType
  override def nullable: Boolean = true
  override def prettyName: String = "reduce_agg"

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction)
      : HigherOrderFunction =
    copy(
      inputFunc = f(inputFunc,
        Seq((stateType, true), (input.dataType, input.nullable))),
      combineFunc = f(combineFunc, Seq((stateType, true), (stateType, true))))

  override def checkInputDataTypes(): TypeCheckResult = {
    val argCheck = checkArgumentDataTypes()
    if (argCheck.isFailure) return argCheck
    if (!initialState.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: initialState must be a constant")
    (inputFunc, combineFunc) match {
      case (fi: LambdaFunction, fc: LambdaFunction) =>
        if (!DataType.equalsStructurally(fi.dataType, stateType,
          ignoreNullability = true))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: inputFunction must return the state type " +
              s"${stateType.catalogString}, got ${fi.dataType.catalogString}")
        else if (!DataType.equalsStructurally(fc.dataType, stateType,
          ignoreNullability = true))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: combineFunction must return the state type " +
              s"${stateType.catalogString}, got ${fc.dataType.catalogString}")
        else if (fi.references.nonEmpty || fc.references.nonEmpty)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: lambdas may reference only their lambda " +
              "variables (a captured column is undefined at merge time)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: third and fourth arguments must be lambda " +
          "functions (s, x) -> ... and (s1, s2) -> ...")
    }
  }

  @transient private lazy val inLambda = inputFunc.asInstanceOf[LambdaFunction]
  @transient private lazy val coLambda = combineFunc.asInstanceOf[LambdaFunction]
  @transient private lazy val Seq(inS, inX) =
    inLambda.arguments.map(_.asInstanceOf[NamedLambdaVariable])
  @transient private lazy val Seq(coA, coB) =
    coLambda.arguments.map(_.asInstanceOf[NamedLambdaVariable])

  override def createAggregationBuffer(): Any =
    InternalRow.copyValue(initialState.eval(InternalRow.empty))

  override def update(buf: Any, row: InternalRow): Any = {
    val v = input.eval(row)
    if (v == null) buf
    else {
      inS.value.set(buf)
      inX.value.set(v)
      InternalRow.copyValue(inLambda.eval(row))
    }
  }

  override def merge(b1: Any, b2: Any): Any = {
    coA.value.set(b1)
    coB.value.set(b2)
    InternalRow.copyValue(coLambda.eval(InternalRow.empty))
  }

  override def eval(buf: Any): Any = buf

  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](stateType))

  override def serialize(buf: Any): Array[Byte] =
    ser(InternalRow(buf)).getBytes

  override def deserialize(bytes: Array[Byte]): Any = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) null
    else InternalRow.copyValue(row.get(0, stateType))
  }

  override def withNewMutableAggBufferOffset(o: Int): ReduceAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReduceAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), initialState = newChildren(1),
      inputFunc = newChildren(2), combineFunc = newChildren(3))
}

/** What the registry builder actually returns for `reduce_agg(...)`.
  *
  * The analyzer's function resolution wraps every AggregateFunction a
  * registry builder produces in `AggregateExpression` BEFORE its
  * lambda-parent check runs, and that check requires the resolved
  * expression to BE a `HigherOrderFunction` — so an aggregate that
  * takes lambdas can never come straight out of the registry. The
  * placeholder is the standard escape: a pure (unevaluable)
  * HigherOrderFunction that satisfies the check and binds the lambdas
  * through the normal `ResolveLambdaVariables` pass; once fully
  * resolved, [[ResolveReduceAgg]] (injected by
  * `graft.functions.GraftExtensions`) rewrites it to the real
  * [[ReduceAgg]] wrapped as a Complete aggregate.
  */
case class ReduceAggPlaceholder(input: Expression, initialState: Expression,
    inputFunc: Expression, combineFunc: Expression)
    extends Expression with HigherOrderFunction
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {

  override def arguments: Seq[Expression] = Seq(input, initialState)
  override def argumentTypes: Seq[AbstractDataType] =
    Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFunc, combineFunc)
  override def functionTypes: Seq[AbstractDataType] =
    Seq(AnyDataType, AnyDataType)
  override def children: Seq[Expression] = arguments ++ functions

  override def dataType: DataType = initialState.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "reduce_agg"

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction)
      : HigherOrderFunction = {
    val st = initialState.dataType
    copy(
      inputFunc = f(inputFunc, Seq((st, true), (input.dataType, input.nullable))),
      combineFunc = f(combineFunc, Seq((st, true), (st, true))))
  }

  /** Same typed contracts as the real aggregate — errors surface at
    * analysis whether or not the rewrite has fired yet.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    ReduceAgg(input, initialState, inputFunc, combineFunc)
      .checkInputDataTypes()

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(input = newChildren(0), initialState = newChildren(1),
      inputFunc = newChildren(2), combineFunc = newChildren(3))
}

/** Resolution rule: a fully-resolved [[ReduceAggPlaceholder]] (lambdas
  * bound, contracts checked) becomes the real [[ReduceAgg]] under a
  * Complete `AggregateExpression` — from here on it is an ordinary
  * typed aggregate (map-side partials, serialized state, merge).
  */
object ResolveReduceAgg
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.resolveExpressions {
      case p: ReduceAggPlaceholder if p.resolved =>
        ReduceAgg(p.input, p.initialState, p.inputFunc, p.combineFunc)
          .toAggregateExpression()
    }
}

// In Spark's own package: HigherOrderFunction's bind signature references
// the private[sql] AbstractDataType (same reason GraftSqlBridge lives in
// org.apache.spark.sql).
package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable, Unevaluable, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types._

/** reduce_agg(value, initial, inputFn, combineFn) — a real mergeable
  * aggregate with O(1)-per-group state (reference:
  * presto-main/.../operator/aggregation/ReduceAggregationFunction.java).
  *
  * Each partial buffer starts at `initial`; `inputFn(state, value)` folds
  * every non-null input row into the partial state; `combineFn(a, b)` merges
  * partial states across partitions/shuffle — so, unlike a
  * collect-the-group rewrite, memory per group is one state value and the
  * combine lambda actually runs (required for non-commutative folds).
  *
  * The lambdas resolve through the standard HigherOrderFunction bind path
  * (same machinery as Catalyst's ArrayAggregate), so `(s, x) -> ...` SQL
  * lambda syntax works unchanged.
  */
case class ReduceAgg(
    input: Expression,
    initial: Expression,
    inputFn: Expression,
    combineFn: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReduceAgg.State] with HigherOrderFunction {

  import ReduceAgg.State

  override def prettyName: String = "reduce_agg"

  override def arguments: Seq[Expression] = Seq(input, initial)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)

  override def children: Seq[Expression] = arguments ++ functions
  override def nullable: Boolean = true
  override def dataType: DataType = initial.dataType

  private def stateType: DataType = initial.dataType

  override def checkInputDataTypes(): TypeCheckResult = {
    val argCheck = checkArgumentDataTypes()
    if (!argCheck.isSuccess) return argCheck
    if (!initial.foldable) {
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName: initial state must be a constant expression")
    }
    (inputFn.dataType, combineFn.dataType) match {
      case (i, _) if !DataType.equalsStructurally(i, stateType, ignoreNullability = true) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: input function must return the state type $stateType, got $i")
      case (_, c) if !DataType.equalsStructurally(c, stateType, ignoreNullability = true) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: combine function must return the state type $stateType, got $c")
      // The combine lambda runs at merge time against no input row, so a
      // body capturing an outer column (which the analyzer's lambda scoping
      // would otherwise allow) must be rejected here — mirroring the
      // reference's state-only combine signature
      // (ReduceAggregationFunction.java combine takes two states only).
      case _ if combineFn.references.nonEmpty =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: combine function must reference only its two state arguments, " +
            s"found outer references: ${combineFn.references.map(_.name).mkString(", ")}")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = {
    val stateArg = (initial.dataType, true)
    val valueArg = (input.dataType, input.nullable)
    copy(
      inputFn = f(inputFn, stateArg :: valueArg :: Nil),
      combineFn = f(combineFn, stateArg :: stateArg :: Nil))
  }

  @transient private lazy val LambdaFunction(_,
    Seq(inStateVar: NamedLambdaVariable, inValueVar: NamedLambdaVariable), _) = inputFn
  @transient private lazy val LambdaFunction(_,
    Seq(coLeftVar: NamedLambdaVariable, coRightVar: NamedLambdaVariable), _) = combineFn
  @transient private lazy val Seq(inputFnForEval, combineFnForEval) = functionsForEval

  @transient private lazy val initialValue: Any = initial.eval(InternalRow.empty)

  override def createAggregationBuffer(): State = new State(false, null)

  override def update(buffer: State, row: InternalRow): State = {
    val v = input.eval(row)
    if (v != null) {
      if (!buffer.initialized) {
        buffer.initialized = true
        buffer.value = InternalRow.copyValue(initialValue)
      }
      inStateVar.value.set(buffer.value)
      inValueVar.value.set(v)
      val next = inputFnForEval.eval(row)
      buffer.value = if (next == null) null else InternalRow.copyValue(next)
    }
    buffer
  }

  override def merge(a: State, b: State): State = {
    if (!b.initialized) a
    else if (!a.initialized) b
    else {
      coLeftVar.value.set(a.value)
      coRightVar.value.set(b.value)
      val merged = combineFnForEval.eval(InternalRow.empty)
      a.value = if (merged == null) null else InternalRow.copyValue(merged)
      a
    }
  }

  /** Null for an empty group (no non-null inputs) — the reference never
    * emits the bare initial state without at least one input.
    */
  override def eval(buffer: State): Any = if (buffer.initialized) buffer.value else null

  @transient private lazy val stateProjection = UnsafeProjection.create(Array(stateType))

  override def serialize(buffer: State): Array[Byte] = {
    if (!buffer.initialized) Array.emptyByteArray
    else stateProjection(InternalRow(buffer.value)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): State = {
    if (bytes.isEmpty) new State(false, null)
    else {
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      val v = row.get(0, stateType)
      new State(true, if (v == null) null else InternalRow.copyValue(v))
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): ReduceAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReduceAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ReduceAgg =
    copy(input = c(0), initial = c(1), inputFn = c(2), combineFn = c(3))
}

object ReduceAgg {
  /** Mutable per-group fold state; `initialized` distinguishes an empty
    * partial (never combined) from a real state.
    */
  final class State(var initialized: Boolean, var value: Any)
}

/** Analysis-time stand-in for reduce_agg on the SQL path.
  *
  * Spark's ResolveFunctions wraps any AggregateFunction returned by a
  * function-registry builder into AggregateExpression *before* its lambda
  * check, and that check requires the resolved root to be a
  * HigherOrderFunction — so a lambda-taking aggregate can never resolve
  * directly through the registry. This placeholder IS a plain
  * HigherOrderFunction (passes the check, binds its lambdas through the
  * standard ResolveLambdaVariables path) and is swapped for
  * `ReduceAgg(...).toAggregateExpression()` by graft.ResolveReduceAgg, an
  * analyzer rule injected via SparkSessionExtensions (graft.GraftExtensions)
  * — the same fixed-point batch, so the swap lands before CheckAnalysis.
  */
case class ReduceAggPlaceholder(
    input: Expression,
    initial: Expression,
    inputFn: Expression,
    combineFn: Expression)
  extends Expression with HigherOrderFunction with Unevaluable {

  override def prettyName: String = "reduce_agg"

  override def arguments: Seq[Expression] = Seq(input, initial)
  override def argumentTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType, AnyDataType)

  override def children: Seq[Expression] = arguments ++ functions
  override def nullable: Boolean = true
  override def dataType: DataType = initial.dataType

  /** Same contract as the real aggregate, so resolution either converges to
    * a swappable, type-correct placeholder or fails with the same message.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    ReduceAgg(input, initial, inputFn, combineFn).checkInputDataTypes()

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = {
    val stateArg = (initial.dataType, true)
    val valueArg = (input.dataType, input.nullable)
    copy(
      inputFn = f(inputFn, stateArg :: valueArg :: Nil),
      combineFn = f(combineFn, stateArg :: stateArg :: Nil))
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ReduceAggPlaceholder =
    copy(input = c(0), initial = c(1), inputFn = c(2), combineFn = c(3))
}

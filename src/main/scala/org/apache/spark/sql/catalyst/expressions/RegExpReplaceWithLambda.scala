// In Spark's own package: HigherOrderFunction's bindInternal signature
// references the private[sql] AbstractDataType (same reason ReduceAgg and
// GraftSqlBridge live under org.apache.spark.sql).
package org.apache.spark.sql.catalyst.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** regexp_replace(string, pattern, function) — the reference's
  * replace-with-lambda form (presto-main/.../operator/scalar/
  * JoniRegexpFunctions.java regexpReplace(Slice, JoniRegexp, lambda)):
  * every match is replaced by the lambda's result, which receives the
  * match's capturing groups as `array<varchar>` (1-based groups; a
  * non-participating group is a NULL element). A NULL lambda result is an
  * error, as in the reference.
  *
  * A scalar HigherOrderFunction resolves directly through the function
  * registry (the analyzer's lambda check only rejects aggregates — see
  * ReduceAggPlaceholder), binding its lambda via the standard
  * ResolveLambdaVariables path like Catalyst's own ArrayTransform.
  */
case class RegExpReplaceWithLambda(
    subject: Expression,
    regexp: Expression,
    function: Expression)
  extends Expression with HigherOrderFunction with CodegenFallback {

  override def prettyName: String = "regexp_replace"

  override def arguments: Seq[Expression] = Seq(subject, regexp)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)

  override def children: Seq[Expression] = arguments ++ functions
  override def nullable: Boolean = subject.nullable || regexp.nullable
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    val argCheck = checkArgumentDataTypes()
    if (!argCheck.isSuccess) return argCheck
    function.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: replacement lambda must return a string, got $other")
    }
  }

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((ArrayType(StringType, containsNull = true), false))))

  @transient private lazy val LambdaFunction(_,
    Seq(groupsVar: NamedLambdaVariable), _) = function
  @transient private lazy val Seq(functionForEval) = functionsForEval

  // per-task compiled-pattern cache (pattern is usually a literal/constant)
  @transient private var cachedPatternStr: String = _
  @transient private var cachedPattern: Pattern = _

  override def eval(input: InternalRow): Any = {
    val s = subject.eval(input)
    val p = regexp.eval(input)
    if (s == null || p == null) return null
    val pStr = p.asInstanceOf[UTF8String].toString
    if (cachedPattern == null || cachedPatternStr != pStr) {
      cachedPatternStr = pStr
      cachedPattern = Pattern.compile(pStr)
    }
    val str = s.asInstanceOf[UTF8String].toString
    val m = cachedPattern.matcher(str)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(str, last, m.start())
      val groups = new Array[Any](m.groupCount())
      var i = 0
      while (i < m.groupCount()) {
        val g = m.group(i + 1)
        groups(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val rep = functionForEval.eval(input)
      if (rep == null) {
        throw new IllegalArgumentException(
          s"regexp_replace: replacement lambda returned NULL for match '${m.group()}'")
      }
      sb.append(rep.asInstanceOf[UTF8String].toString)
      last = m.end()
    }
    sb.append(str, last, str.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): RegExpReplaceWithLambda =
    copy(subject = c(0), regexp = c(1), function = c(2))
}

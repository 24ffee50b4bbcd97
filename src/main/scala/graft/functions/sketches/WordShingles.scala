package graft.functions.sketches

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles as one native expression — the other hot
  * loop of corpus dedup. The Column formulation (split → transform over a
  * sequence → slice → array_join → array_distinct) runs as interpreted
  * lambdas that allocate a slice array and join per position; this is a
  * flat JVM pass: split once, slide a window, build each shingle string,
  * keep first occurrences.
  *
  * String-identical to the lambda form (locked by spec): tokens come from
  * the same `\s+` regex split with unlimited limit, a text shorter than n
  * words yields its whole token list as the single shingle, and distinct
  * preserves first-occurrence order.
  */
case class WordShingles(text: Expression, n: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = n
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, n.dataType) match {
      case (StringType, IntegerType) =>
        if (n.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be a literal")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got $other")
    }

  @transient private lazy val shingleLen: Int =
    n.eval(null).asInstanceOf[Int]

  @transient private lazy val wsPattern: UTF8String = UTF8String.fromString("\\s+")

  override protected def nullSafeEval(t: Any, nv: Any): Any = {
    val toks = t.asInstanceOf[UTF8String].split(wsPattern, -1)
    val len = toks.length
    val m = math.max(len - shingleLen + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + shingleLen, len)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(text = newLeft, n = newRight)
}

package graft.functions.sketches

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum-md5 sliding-window fingerprint (llm/TextOps.fingerprint's
  * winnowing-style selection) as one native expression: md5 each
  * character w-gram, keep the lexicographically smallest hex digest.
  * Value-identical to the lambda form (array_min over md5(substring)) —
  * substring follows SQL character semantics (UTF8String.substringSQL),
  * md5 is hex lowercase, and a text shorter than w yields the digest of
  * the whole text. The md5 choice is deliberate: an external engine (the
  * DuckDB oracle included) reproduces it byte-for-byte.
  */
case class RollingFingerprint(text: Expression, w: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = w
  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, w.dataType) match {
      case (StringType, IntegerType) =>
        if (w.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: window must be a literal")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got $other")
    }

  @transient private lazy val window: Int = w.eval(null).asInstanceOf[Int]
  @transient private lazy val md5 = MessageDigest.getInstance("MD5")
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xF)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  override protected def nullSafeEval(t: Any, nv: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val len = s.numChars()
    val m = math.max(len - window + 1, 1)
    var min: String = null
    var i = 0
    while (i < m) {
      md5.reset()
      val h = hex(md5.digest(s.substringSQL(i + 1, window).getBytes))
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingFingerprint =
    copy(text = newLeft, w = newRight)
}

package graft.functions.sketches

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash over an element array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms") as one native
  * expression — replaces the interpreted double fold in llm/TextOps
  * (64-long vote array + zip_with per element). Value-identical to it
  * (locked by spec): same per-element xxhash64 (seed 42), majority vote
  * per bit with ties (vote ≤ 0) resolving to 0, and a null element
  * hashing to the bare seed — exactly what xxhash64(NULL) evaluates to in
  * the lambda form (hash expressions skip null children, leaving the
  * seed).
  */
case class SimHash64Expr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array input, got $other")
    }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L // xxhash64(NULL) = seed, as in the lambda form
        else XxHash64Function.hash(arr.get(i, elemType), elemType, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

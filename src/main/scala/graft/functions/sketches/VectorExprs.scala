package graft.functions.sketches

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity path (llm/Similarity) — flat
  * JVM loops replacing interpreted `zip_with`/`aggregate` lambda folds.
  * Each is VALUE-IDENTICAL to the lambda form it replaces (locked by
  * spec): same sequential accumulation order, same null propagation, so
  * existing results and oracles are unchanged.
  */
private[graft] object VectorExprs {
  /** Element as double, mirroring `x.cast("double")`; null stays null. */
  def toDouble(arr: ArrayData, i: Int, et: DataType): java.lang.Double =
    if (arr.isNullAt(i)) null
    else et match {
      case DoubleType => arr.getDouble(i)
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case dt: DecimalType => arr.getDecimal(i, dt.precision, dt.scale).toDouble
      case other => throw new IllegalArgumentException(s"non-numeric vector element: $other")
    }
}

/** cosine_similarity over two numeric arrays — the dense form
  * (MathFunctions.java cosine_similarity; llm pipelines' embedding
  * distance). Lambda-form semantics preserved exactly: length mismatch or
  * a null element → NULL (zip_with pads with nulls and the fold
  * propagates them), zero norm → NULL (0/0 via nullif).
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cosine_similarity"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: ArrayType, _: ArrayType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays, got $other")
    }

  @transient private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = VectorExprs.toDouble(a, i, leftElem)
      val y = VectorExprs.toDouble(b, i, rightElem)
      if (x == null || y == null) return null
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane sign bucket (Charikar 2002) — bit j is the sign of
  * dot(vec, plane_j) over the deterministic hash-derived plane matrix
  * (llm/Similarity.planes). Lambda-form semantics preserved: a vector
  * whose length differs from `dim` nulls every dot, and a null dot takes
  * the `otherwise(0)` branch — bucket 0.
  */
case class LshSignBucket(child: Expression, nPlanes: Int, dim: Int)
  extends UnaryExpression with CodegenFallback {

  require(nPlanes > 0 && nPlanes <= 62, "nPlanes must be in [1, 62]")

  override def prettyName: String = "lsh_sign_bucket"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array input, got $other")
    }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  // deterministic pseudo-random components in [-1, 1] — identical formula
  // to Similarity.planes so buckets are reproducible across runs
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, i) =>
      scala.util.hashing.byteswap64(j.toLong * 1000003L + i).toDouble /
        Long.MaxValue.toDouble
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return 0L
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      val plane = planes(j)
      var dot = 0.0
      var i = 0
      var sawNull = false
      while (i < dim && !sawNull) {
        val x = VectorExprs.toDouble(v, i, elemType)
        if (x == null) sawNull = true
        else dot += x * plane(i)
        i += 1
      }
      if (!sawNull && dot >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBucket =
    copy(child = newChild)
}

package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Re-mergeable quantile sketch carried as a BinaryType value — the
  * engine-visible counterpart of the reference's qdigest type
  * (presto-spi/.../type/QuantileDigestType.java, aggregation
  * QuantileDigestAggregationFunction.java, scalars
  * scalar/QuantileDigestFunctions.java:115). The internal summary is a
  * capped set of (center, weight) bins (same Ben-Haim/Tom-Tov scheme as
  * numeric_histogram) rather than the reference's q-digest tree — the
  * *surface* (build / merge / value_at_quantile / quantile_at_value) is
  * what parity requires; bytes are engine-specific like every sketch.
  *
  * Binary layout: magic 'QD16' int, bin count int, then (center, weight)
  * double pairs. The magic lets merge() distinguish quantile sketches
  * from HLL sketches (which are exactly 4096 raw register bytes).
  */
object QDigest {
  val Magic: Int = 0x51443136 // "QD16"
  val MaxBins: Int = 256

  /** Catalyst numeric → double (SQL literals arrive as Decimal, which is
    * not a java.lang.Number).
    */
  def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  type Bins = mutable.ArrayBuffer[(Double, Double)]

  def insert(bins: Bins, v: Double, w: Double): Unit = {
    var lo = 0
    var hi = bins.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bins(mid)._1 < v) lo = mid + 1 else hi = mid
    }
    if (lo < bins.length && bins(lo)._1 == v) bins(lo) = (v, bins(lo)._2 + w)
    else bins.insert(lo, (v, w))
    while (bins.length > MaxBins) {
      var bestI = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < bins.length - 1) {
        val gap = bins(i + 1)._1 - bins(i)._1
        if (gap < bestGap) { bestGap = gap; bestI = i }
        i += 1
      }
      val (c1, w1) = bins(bestI)
      val (c2, w2) = bins(bestI + 1)
      bins(bestI) = ((c1 * w1 + c2 * w2) / (w1 + w2), w1 + w2)
      bins.remove(bestI + 1)
    }
  }

  def serialize(bins: Bins): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bins.length * 16)
    bb.putInt(Magic).putInt(bins.length)
    bins.foreach { case (c, w) => bb.putDouble(c); bb.putDouble(w) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Bins = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt == Magic, "not a qdigest sketch")
    val n = bb.getInt
    val out = mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) { out += ((bb.getDouble, bb.getDouble)); i += 1 }
    out
  }

  def isQDigest(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt == Magic

  /** Value at quantile q with linear interpolation inside the cumulative
    * weight walk.
    */
  def valueAtQuantile(bins: Bins, q: Double): Double = {
    require(q >= 0 && q <= 1, "quantile must be in [0, 1]")
    if (bins.isEmpty) return Double.NaN
    val total = bins.map(_._2).sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < bins.length) {
      cum += bins(i)._2
      if (cum >= target) return bins(i)._1
      i += 1
    }
    bins.last._1
  }

  /** Fraction of mass at or below v. */
  def quantileAtValue(bins: Bins, v: Double): Double = {
    if (bins.isEmpty) return Double.NaN
    val total = bins.map(_._2).sum
    var cum = 0.0
    var i = 0
    while (i < bins.length && bins(i)._1 <= v) { cum += bins(i)._2; i += 1 }
    cum / total
  }
}

/** qdigest_agg(x) → quantile sketch (QuantileDigestAggregationFunction.java). */
case class QDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Bins] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qdigest_agg"

  override def createAggregationBuffer(): QDigest.Bins = mutable.ArrayBuffer.empty

  override def update(buffer: QDigest.Bins, input: InternalRow): QDigest.Bins = {
    val v = child.eval(input)
    if (v != null) QDigest.insert(buffer, QDigest.toDouble(v), 1.0)
    buffer
  }

  override def merge(a: QDigest.Bins, b: QDigest.Bins): QDigest.Bins = {
    b.foreach { case (c, w) => QDigest.insert(a, c, w) }
    a
  }

  override def eval(buffer: QDigest.Bins): Any = QDigest.serialize(buffer)
  override def serialize(buffer: QDigest.Bins): Array[Byte] = QDigest.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): QDigest.Bins = QDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): QDigestAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QDigestAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QDigestAgg =
    copy(child = c.head)
}

/** merge(sketch) unifying HLL and qdigest inputs — dispatches per blob on
  * the qdigest magic (HLL blobs are raw 4096 register bytes; a qdigest
  * blob is 8 + 16n bytes and starts with the magic, and 4096 = 8 + 16n has
  * no integer solution with the magic prefix, so the tag is unambiguous).
  */
case class SketchUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Either[Array[Byte], QDigest.Bins]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge"

  // empty-state marker: Left(empty HLL) until the first input decides
  override def createAggregationBuffer(): Either[Array[Byte], QDigest.Bins] =
    Left(Hll.empty())

  private def mergeBlob(buf: Either[Array[Byte], QDigest.Bins], blob: Array[Byte]): Either[Array[Byte], QDigest.Bins] =
    if (QDigest.isQDigest(blob)) {
      val bins = buf match {
        case Right(b) => b
        case Left(regs) if regs.forall(_ == 0) => mutable.ArrayBuffer.empty[(Double, Double)]
        case Left(_) => throw new IllegalArgumentException("merge: mixed HLL and qdigest inputs")
      }
      QDigest.deserialize(blob).foreach { case (c, w) => QDigest.insert(bins, c, w) }
      Right(bins)
    } else buf match {
      case Left(regs) =>
        require(blob.length == Hll.M, s"merge: not a sketch (${blob.length} bytes)")
        Hll.mergeInto(regs, blob); Left(regs)
      case Right(_) => throw new IllegalArgumentException("merge: mixed HLL and qdigest inputs")
    }

  override def update(buffer: Either[Array[Byte], QDigest.Bins], input: InternalRow): Either[Array[Byte], QDigest.Bins] =
    child.eval(input) match {
      case null => buffer
      case blob: Array[Byte] => mergeBlob(buffer, blob)
    }

  override def merge(a: Either[Array[Byte], QDigest.Bins], b: Either[Array[Byte], QDigest.Bins]): Either[Array[Byte], QDigest.Bins] =
    b match {
      case Left(regs) if regs.forall(_ == 0) => a
      case Left(regs) => mergeBlob(a, regs)
      case Right(bins) => mergeBlob(a, QDigest.serialize(bins))
    }

  override def eval(buffer: Either[Array[Byte], QDigest.Bins]): Any = buffer match {
    case Left(regs) => regs
    case Right(bins) => QDigest.serialize(bins)
  }

  override def serialize(buffer: Either[Array[Byte], QDigest.Bins]): Array[Byte] =
    eval(buffer).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Either[Array[Byte], QDigest.Bins] =
    if (QDigest.isQDigest(bytes)) Right(QDigest.deserialize(bytes)) else Left(bytes)

  override def withNewMutableAggBufferOffset(n: Int): SketchUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SketchUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SketchUnionAgg =
    copy(child = c.head)
}

/** value_at_quantile(qdigest, q) scalar (QuantileDigestFunctions.java). */
case class ValueAtQuantile(digest: Expression, quantile: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(digest, quantile)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "value_at_quantile"
  override def eval(input: InternalRow): Any = {
    val d = digest.eval(input)
    val q = quantile.eval(input)
    if (d == null || q == null) null
    else QDigest.valueAtQuantile(
      QDigest.deserialize(d.asInstanceOf[Array[Byte]]),
      QDigest.toDouble(q))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ValueAtQuantile =
    copy(digest = c(0), quantile = c(1))
}

/** values_at_quantiles(qdigest, array<double>) scalar. */
case class ValuesAtQuantiles(digest: Expression, quantiles: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(digest, quantiles)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "values_at_quantiles"
  override def eval(input: InternalRow): Any = {
    val d = digest.eval(input)
    val qs = quantiles.eval(input)
    if (d == null || qs == null) null
    else {
      val bins = QDigest.deserialize(d.asInstanceOf[Array[Byte]])
      val ad = qs.asInstanceOf[ArrayData]
      val et = quantiles.dataType.asInstanceOf[ArrayType].elementType
      val out = (0 until ad.numElements()).map(i =>
        QDigest.valueAtQuantile(bins, QDigest.toDouble(ad.get(i, et))))
      new GenericArrayData(out.toArray)
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ValuesAtQuantiles =
    copy(digest = c(0), quantiles = c(1))
}

/** quantile_at_value(qdigest, v) scalar. */
case class QuantileAtValue(digest: Expression, value: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(digest, value)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantile_at_value"
  override def eval(input: InternalRow): Any = {
    val d = digest.eval(input)
    val v = value.eval(input)
    if (d == null || v == null) null
    else QDigest.quantileAtValue(
      QDigest.deserialize(d.asInstanceOf[Array[Byte]]),
      QDigest.toDouble(v))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QuantileAtValue =
    copy(digest = c(0), value = c(1))
}

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

/** Union state for merge(sketch) across the three sketch families. */
sealed trait SketchUnionBuf
object SketchUnionBuf {
  case object Empty extends SketchUnionBuf
  final case class H(regs: Array[Byte]) extends SketchUnionBuf
  final case class Q(bins: QDigest.Bins) extends SketchUnionBuf
  final case class S(digest: SetDigest.Digest) extends SketchUnionBuf
}

/** merge(sketch) unifying HLL, qdigest and setdigest inputs — dispatches
  * per blob on the magics (HLL blobs are raw 4096 register bytes whose
  * entries are ranks ≤ 53, so neither magic's first byte can open one;
  * qdigest and setdigest each lead with a distinct magic int). Mixing
  * families inside one group is an error, as in the reference.
  */
case class SketchUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SketchUnionBuf] {
  import SketchUnionBuf._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge"

  override def createAggregationBuffer(): SketchUnionBuf = Empty

  private def mixed(): Nothing =
    throw new IllegalArgumentException("merge: mixed sketch families in one group")

  private def mergeBlob(buf: SketchUnionBuf, blob: Array[Byte]): SketchUnionBuf =
    if (QDigest.isQDigest(blob)) {
      val bins = buf match {
        case Q(b) => b
        case Empty => mutable.ArrayBuffer.empty[(Double, Double)]
        case _ => mixed()
      }
      QDigest.deserialize(blob).foreach { case (c, w) => QDigest.insert(bins, c, w) }
      Q(bins)
    } else if (SetDigest.isSetDigest(blob)) {
      val d = buf match {
        case S(d0) => d0
        case Empty => SetDigest.empty()
        case _ => mixed()
      }
      d.mergeInto(SetDigest.deserialize(blob))
      S(d)
    } else {
      require(blob.length == Hll.M, s"merge: not a sketch (${blob.length} bytes)")
      buf match {
        case H(regs) => Hll.mergeInto(regs, blob); H(regs)
        case Empty =>
          val regs = Hll.empty(); Hll.mergeInto(regs, blob); H(regs)
        case _ => mixed()
      }
    }

  override def update(buffer: SketchUnionBuf, input: InternalRow): SketchUnionBuf =
    child.eval(input) match {
      case null => buffer
      case blob: Array[Byte] => mergeBlob(buffer, blob)
    }

  override def merge(a: SketchUnionBuf, b: SketchUnionBuf): SketchUnionBuf =
    b match {
      case Empty => a
      case other => mergeBlob(a, eval(other).asInstanceOf[Array[Byte]])
    }

  override def eval(buffer: SketchUnionBuf): Any = buffer match {
    case Empty => Hll.empty() // empty-input convention: empty HLL, as before
    case H(regs) => regs
    case Q(bins) => QDigest.serialize(bins)
    case S(d) => SetDigest.serialize(d)
  }

  // Shuffle form: Empty is a zero-length blob so a row-less partition's
  // partial buffer can merge into ANY family (an empty HLL marker here
  // would falsely "mix" with a qdigest/setdigest group).
  override def serialize(buffer: SketchUnionBuf): Array[Byte] = buffer match {
    case Empty => Array.emptyByteArray
    case other => eval(other).asInstanceOf[Array[Byte]]
  }

  override def deserialize(bytes: Array[Byte]): SketchUnionBuf =
    if (bytes.isEmpty) SketchUnionBuf.Empty
    else if (QDigest.isQDigest(bytes)) SketchUnionBuf.Q(QDigest.deserialize(bytes))
    else if (SetDigest.isSetDigest(bytes)) SketchUnionBuf.S(SetDigest.deserialize(bytes))
    else SketchUnionBuf.H(bytes)

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

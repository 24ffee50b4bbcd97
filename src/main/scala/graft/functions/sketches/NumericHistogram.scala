package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** numeric_histogram(buckets, x) → map<double, double> of bin-center →
  * weight, the streaming equi-depth-ish histogram of Ben-Haim & Tom-Tov
  * ("A Streaming Parallel Decision Tree Algorithm", JMLR 2010) that the
  * reference implements in operator/aggregation/NumericHistogram.java:
  * insert each value as a unit bin, then repeatedly merge the two closest
  * bins (weighted average) until at most `buckets` remain. Approximate and
  * insertion-order-sensitive by construction — properties (mass
  * conservation, bin cap, bounded span) are what tests assert.
  */
case class NumericHistogramAgg(
    bucketsExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Double)]] {

  private lazy val maxBins: Int = bucketsExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"numeric_histogram: bucket count must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(bucketsExpr, child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(DoubleType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "numeric_histogram"

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Double, Double)] =
    mutable.ArrayBuffer.empty

  /** Keep bins sorted by center; merge closest adjacent pair while over
    * capacity (adjacent suffices on a sorted list).
    */
  private def compact(bins: mutable.ArrayBuffer[(Double, Double)]): Unit = {
    while (bins.length > maxBins) {
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

  private def insert(bins: mutable.ArrayBuffer[(Double, Double)], v: Double, w: Double): Unit = {
    var lo = 0
    var hi = bins.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bins(mid)._1 < v) lo = mid + 1 else hi = mid
    }
    if (lo < bins.length && bins(lo)._1 == v)
      bins(lo) = (v, bins(lo)._2 + w)
    else
      bins.insert(lo, (v, w))
    compact(bins)
  }

  override def update(buffer: mutable.ArrayBuffer[(Double, Double)], input: InternalRow): mutable.ArrayBuffer[(Double, Double)] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, graft.functions.sketches.QDigest.toDouble(v), 1.0)
    buffer
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Double)], b: mutable.ArrayBuffer[(Double, Double)]): mutable.ArrayBuffer[(Double, Double)] = {
    b.foreach { case (c, w) => insert(a, c, w) }
    a
  }

  override def eval(buffer: mutable.ArrayBuffer[(Double, Double)]): Any =
    new ArrayBasedMapData(
      new GenericArrayData(buffer.map(_._1).toArray),
      new GenericArrayData(buffer.map(_._2).toArray))

  override def serialize(buffer: mutable.ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.length * 16)
    bb.putInt(buffer.length)
    buffer.foreach { case (c, w) => bb.putDouble(c); bb.putDouble(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Double, Double)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) { out += ((bb.getDouble, bb.getDouble)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): NumericHistogramAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): NumericHistogramAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): NumericHistogramAgg =
    copy(bucketsExpr = c(0), child = c(1))
}

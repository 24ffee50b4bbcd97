package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** Re-mergeable set sketch — the reference's SetDigest type
  * (presto-main/.../type/setdigest/SetDigest.java and
  * SetDigestFunctions.java: make_set_digest / merge_set_digest /
  * cardinality / intersection_cardinality / jaccard_index / hash_counts),
  * carried as BinaryType like the HLL and qdigest sketches.
  *
  * State: the k smallest (unsigned) xxhash64 values of the elements seen,
  * each with an occurrence count — a bottom-k (KMV) sketch. Below
  * saturation (< k distinct hashes) every operation is EXACT: cardinality
  * is the entry count, jaccard/intersection are computed on the complete
  * hash sets. At saturation the standard published estimators take over:
  * KMV cardinality (k−1)/v_k (Bar-Yossef et al. 2002, "Counting distinct
  * elements in a data stream") and the bottom-k MinHash Jaccard estimate
  * over the union's k smallest hashes (Broder 1997) — the same estimators
  * the reference uses for its MinHash component.
  *
  * Binary layout: magic 'SD16' int, k int, entry count int, then
  * (hash long, count int) pairs in ascending unsigned-hash order. The
  * magic byte 0x53 ('S') cannot open an HLL blob (registers are ranks
  * ≤ 53) and differs from the qdigest magic, so merge()/cardinality()
  * dispatch is unambiguous across all three sketch families.
  */
object SetDigest {
  val Magic = 0x53443136 // "SD16"
  val DefaultK = 8192
  val MaxCount = 32767 // counts saturate like the reference's short counts

  private val unsignedOrd: Ordering[Long] =
    (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b)

  /** Mutable digest: unsigned-sorted map hash → count, capped at k keys. */
  final class Digest(val k: Int) {
    val entries: mutable.TreeMap[Long, Int] = mutable.TreeMap.empty(unsignedOrd)
    var saturated: Boolean = false

    def addHash(h: Long, c: Int = 1): Unit = entries.get(h) match {
      case Some(n) => entries.update(h, math.min(n + c, MaxCount))
      case None =>
        if (entries.size < k) entries.update(h, math.min(c, MaxCount))
        else {
          val maxKey = entries.lastKey
          if (java.lang.Long.compareUnsigned(h, maxKey) < 0) {
            entries.remove(maxKey)
            entries.update(h, math.min(c, MaxCount))
          }
          saturated = true
        }
    }

    def mergeInto(other: Digest): Unit = {
      other.entries.foreach { case (h, c) => addHash(h, c) }
      saturated ||= other.saturated
    }

    /** Exact entry count below saturation; KMV estimate (k−1)/v_k above. */
    def cardinality: Long =
      if (!saturated || entries.size < k) entries.size.toLong
      else {
        val kth = entries.lastKey
        val twoTo64 = 1.8446744073709552e19
        val asUnsigned = if (kth >= 0) kth.toDouble else kth.toDouble + twoTo64
        math.round((k - 1).toDouble / (asUnsigned / twoTo64))
      }
  }

  def empty(k: Int = DefaultK): Digest = new Digest(k)

  def serialize(d: Digest): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(16 + 12 * d.entries.size)
    buf.putInt(Magic).putInt(d.k).putInt(if (d.saturated) 1 else 0).putInt(d.entries.size)
    d.entries.foreach { case (h, c) => buf.putLong(h).putInt(c) }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): Digest = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require(buf.getInt() == Magic, "not a setdigest blob")
    val d = new Digest(buf.getInt())
    d.saturated = buf.getInt() == 1
    val n = buf.getInt()
    var i = 0
    while (i < n) { d.entries.update(buf.getLong(), buf.getInt()); i += 1 }
    d
  }

  def isSetDigest(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 &&
      java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt == Magic

  /** Bottom-k MinHash Jaccard (SetDigestFunctions.java jaccard_index):
    * exact when neither side saturated; otherwise the fraction of the
    * union's k smallest hashes present in both.
    */
  def jaccard(a: Digest, b: Digest): Double = {
    if (!a.saturated && !b.saturated) {
      val inter = a.entries.keySet.count(b.entries.contains)
      val union = a.entries.size + b.entries.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    } else {
      val k = math.min(math.min(a.entries.size, b.entries.size), math.min(a.k, b.k))
      if (k == 0) return 1.0
      val union = mutable.TreeMap.empty[Long, Unit](unsignedOrd)
      a.entries.keysIterator.foreach(h => union.update(h, ()))
      b.entries.keysIterator.foreach(h => union.update(h, ()))
      var inBoth = 0
      union.keysIterator.take(k).foreach { h =>
        if (a.entries.contains(h) && b.entries.contains(h)) inBoth += 1
      }
      inBoth.toDouble / k
    }
  }

  /** Exact |A∩B| below saturation; jaccard × union-cardinality estimate
    * above (SetDigestFunctions.java intersection_cardinality).
    */
  def intersectionCardinality(a: Digest, b: Digest): Long =
    if (!a.saturated && !b.saturated)
      a.entries.keySet.count(b.entries.contains).toLong
    else {
      val u = empty(math.min(a.k, b.k))
      u.mergeInto(a); u.mergeInto(b)
      math.round(jaccard(a, b) * u.cardinality.toDouble)
    }
}

/** make_set_digest(x) aggregate (SetDigestFunctions.java:56). */
case class MakeSetDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigest.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "make_set_digest"

  override def createAggregationBuffer(): SetDigest.Digest = SetDigest.empty()

  override def update(buffer: SetDigest.Digest, input: InternalRow): SetDigest.Digest = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(buffer: SetDigest.Digest, other: SetDigest.Digest): SetDigest.Digest = {
    buffer.mergeInto(other); buffer
  }

  override def eval(buffer: SetDigest.Digest): Any = SetDigest.serialize(buffer)
  override def serialize(buffer: SetDigest.Digest): Array[Byte] = SetDigest.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): SetDigest.Digest = SetDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): MakeSetDigestAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MakeSetDigestAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MakeSetDigestAgg =
    copy(child = c.head)
}

/** Base for the binary scalars over two setdigest blobs. */
abstract class SetDigestBinaryScalar extends Expression with CodegenFallback {
  def left: Expression
  def right: Expression
  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = true
  override def foldable: Boolean = left.foldable && right.foldable

  protected def compute(a: SetDigest.Digest, b: SetDigest.Digest): Any

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) null
    else compute(
      SetDigest.deserialize(l.asInstanceOf[Array[Byte]]),
      SetDigest.deserialize(r.asInstanceOf[Array[Byte]]))
  }
}

/** jaccard_index(x, y) (SetDigestFunctions.java:135). */
case class JaccardIndex(left: Expression, right: Expression) extends SetDigestBinaryScalar {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_index"
  override protected def compute(a: SetDigest.Digest, b: SetDigest.Digest): Any =
    SetDigest.jaccard(a, b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): JaccardIndex =
    copy(left = c(0), right = c(1))
}

/** intersection_cardinality(x, y) (SetDigestFunctions.java:122). */
case class IntersectionCardinality(left: Expression, right: Expression) extends SetDigestBinaryScalar {
  override def dataType: DataType = LongType
  override def prettyName: String = "intersection_cardinality"
  override protected def compute(a: SetDigest.Digest, b: SetDigest.Digest): Any =
    SetDigest.intersectionCardinality(a, b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): IntersectionCardinality =
    copy(left = c(0), right = c(1))
}

/** hash_counts(x) → map<bigint, int> of retained hash → occurrence count
  * (SetDigestFunctions.java:149; the reference returns map<bigint,smallint>).
  */
case class HashCounts(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = MapType(LongType, IntegerType, valueContainsNull = false)
  override def prettyName: String = "hash_counts"
  override def foldable: Boolean = child.foldable

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => null
    case b: Array[Byte] =>
      val d = SetDigest.deserialize(b)
      ArrayBasedMapData(
        d.entries.keysIterator.toArray,
        d.entries.valuesIterator.toArray)
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HashCounts =
    copy(child = c.head)
}

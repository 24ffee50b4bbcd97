package graft.functions.sketches

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Dense HyperLogLog sketch with p=12 (4096 registers, ~1.6% standard
  * error — the reference's default, ApproximateSetAggregation.java
  * DEFAULT_STANDARD_ERROR=0.01625 in presto-main/.../aggregation/).
  *
  * The sketch VALUE is the engine-visible re-mergeable object (Presto's
  * HyperLogLog type, presto-spi/.../type/HyperLogLogType.java) carried as
  * BinaryType: `approx_set(x)` builds one, `merge(hll)` unions them,
  * `cardinality(hll)` estimates. Flajolet et al.'s standard estimator with
  * linear counting for the small range — deterministic for a given input
  * set, so results are stable across partitionings (union is commutative,
  * registers take max).
  */
object Hll {
  val P = 12
  val M: Int = 1 << P                  // 4096 registers
  private val Alpha = 0.7213 / (1 + 1.079 / M)

  def empty(): Array[Byte] = new Array[Byte](M)

  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val rest = hash << P
    // rank = leading zeros of the remaining 52 bits + 1, capped
    val rank = (if (rest == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }
}

/** approx_set(x) → HLL sketch (ApproximateSetAggregation.java). */
case class ApproxSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_set"

  override def createAggregationBuffer(): Array[Byte] = Hll.empty()

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buffer, XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buffer, other); buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ApproxSetAgg =
    copy(child = newChildren.head)
}

/** merge(hll) → unioned HLL sketch (MergeHyperLogLogAggregation.java). */
case class HllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge"

  override def createAggregationBuffer(): Array[Byte] = Hll.empty()

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    child.eval(input) match {
      case b: Array[Byte] if b.length == Hll.M => Hll.mergeInto(buffer, b)
      case null => ()
      case b: Array[Byte] => throw new IllegalArgumentException(
        s"merge: not an HLL sketch (${b.length} bytes, expected ${Hll.M})")
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.mergeInto(buffer, other); buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllUnionAgg =
    copy(child = newChildren.head)
}

/** cardinality(hll) scalar over a sketch binary
  * (scalar/HyperLogLogFunctions.java:43).
  */
case class HllCardinality(child: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType
  override def prettyName: String = "cardinality"
  override def foldable: Boolean = child.foldable

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => null
    case b: Array[Byte] if SetDigest.isSetDigest(b) => SetDigest.deserialize(b).cardinality
    case b: Array[Byte] if b.length == Hll.M => Hll.estimate(b)
    case b: Array[Byte] => throw new IllegalArgumentException(
      s"cardinality: not an HLL or setdigest sketch (${b.length} bytes)")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllCardinality =
    copy(child = newChildren.head)
}

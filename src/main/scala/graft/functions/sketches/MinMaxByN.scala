package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** max_by(x, y, n) / min_by(x, y, n) with a bounded heap — the reference's
  * TypedHeap-backed n-variants (operator/aggregation/MinNAggregationFunction
  * .java, MaxNAggregationFunction.java, TypedHeap.java). State is at most n
  * (key, value) pairs per group, so memory is O(n) regardless of group
  * size — the collect-the-whole-group rewrite this replaces held the full
  * group in memory, which does not survive 100 TB groups.
  *
  * Ordering uses catalyst's interpreted ordering for the key type; ties
  * resolve arbitrarily (same contract as the reference).
  */
case class MinMaxByNAgg(
    value: Expression,
    key: Expression,
    nExpr: Expression,
    isMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  private lazy val n: Int = nExpr.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"${prettyName}: n must be an integer literal, got $other")
  }

  @transient private lazy val keyOrdering: Ordering[Any] = {
    val base = org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(key.dataType)
      .asInstanceOf[Ordering[Any]]
    if (isMax) base else base.reverse   // heap root = worst element to evict
  }

  private def heapOrdering: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(keyOrdering.reverse) // min-root for max_by

  override def children: Seq[Expression] = Seq(value, key, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(value.dataType, containsNull = true)
  override def prettyName: String = if (isMax) "max_by" else "min_by"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty[(Any, Any)](heapOrdering)

  private def offer(heap: mutable.PriorityQueue[(Any, Any)], k: Any, v: Any): Unit = {
    if (heap.size < n) heap.enqueue((k, v))
    else if (keyOrdering.compare(k, heap.head._1) > 0) { heap.dequeue(); heap.enqueue((k, v)) }
  }

  override def update(heap: mutable.PriorityQueue[(Any, Any)], input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val k = key.eval(input)
    if (k != null) {
      val v = value.eval(input)
      offer(heap, InternalRow.copyValue(k), if (v == null) null else InternalRow.copyValue(v))
    }
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Any, Any)], b: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    b.foreach { case (k, v) => offer(a, k, v) }
    a
  }

  /** Result in best-first order (descending key for max_by, ascending for
    * min_by — matching the reference's output order).
    */
  override def eval(heap: mutable.PriorityQueue[(Any, Any)]): Any =
    new GenericArrayData(heap.toSeq.sortBy(_._1)(keyOrdering.reverse).map(_._2).toArray)

  override def serialize(heap: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    val arr = heap.toArray
    oos.writeInt(arr.length)
    arr.foreach { case (k, v) => oos.writeObject(k); oos.writeObject(v) }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val n0 = ois.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n0) { heap.enqueue((ois.readObject(), ois.readObject())); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): MinMaxByNAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinMaxByNAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinMaxByNAgg =
    copy(value = c(0), key = c(1), nExpr = c(2))
}

package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._

/** approx_most_frequent(buckets, value, capacity) — Metwally et al.'s
  * SpaceSaving heavy-hitters summary (the algorithm behind the
  * approx_most_frequent aggregates of the major SQL engines; the reference
  * era predates the function, so this is part of the corpus-stats surface a
  * training-data pipeline needs — top-k token counts over a 100 TB corpus
  * with O(capacity) state per group instead of a full GROUP BY over every
  * distinct token).
  *
  * Guarantees: per-key estimate overshoots the true count by at most the
  * recorded `error` (≤ n/capacity); any key with true count > n/capacity
  * is retained. When the number of distinct keys never exceeds `capacity`
  * on any partition, no eviction occurs anywhere, counts are exact, and
  * merge is an exact sum — the declared query runs in that regime so the
  * DuckDB oracle can check it bit-exactly (same stance as SetDigest's
  * "exact below saturation").
  *
  * Returns a map<value, bigint> of the top `buckets` keys, entries ordered
  * by (count desc, key asc) so the result is deterministic.
  */
final class SpaceSavingState(val capacity: Int, keyOrd: Ordering[Any]) {
  /** value -> (estimated count, max overestimation error) */
  val counts = mutable.HashMap.empty[Any, (Long, Long)]
  /** Dequeue order for the lazy-deletion eviction heap: smallest count
    * first, count ties broken by LARGEST key under keyOrd — so which of
    * several equal-count keys gets evicted is a function of the summary's
    * content, never of HashMap/heap insertion order (offer() is the only
    * place eviction happens; an order-dependent victim there would make
    * approx_most_frequent output vary run-to-run under eviction).
    */
  private val heapOrd: Ordering[(Long, Any)] = new Ordering[(Long, Any)] {
    def compare(x: (Long, Any), y: (Long, Any)): Int = {
      val c = java.lang.Long.compare(y._1, x._1)
      if (c != 0) c else keyOrd.compare(x._2, y._2)
    }
  }
  /** lazy-deletion heap over (count, value); entries go stale when a
    * key is incremented or evicted — validated against `counts` on pop.
    * Compacted when it outgrows 4×capacity so memory stays O(capacity).
    */
  private var heap = mutable.PriorityQueue.empty[(Long, Any)](heapOrd)

  private def push(count: Long, key: Any): Unit = {
    heap.enqueue((count, key))
    if (heap.size > 4 * capacity) {
      heap = mutable.PriorityQueue.empty[(Long, Any)](heapOrd)
      counts.foreach { case (k, (c, _)) => heap.enqueue((c, k)) }
    }
  }

  def offer(v: Any, by: Long = 1L, err: Long = 0L): Unit =
    counts.get(v) match {
      case Some((c, e)) =>
        counts(v) = (c + by, e + err)
        push(c + by, v)
      case None if counts.size < capacity =>
        counts(v) = (by, err)
        push(by, v)
      case None =>
        // evict the current minimum; the newcomer inherits its count as
        // the upper bound on how much it may have been undercounted
        var top = heap.dequeue()
        while (!counts.get(top._2).exists(_._1 == top._1)) top = heap.dequeue()
        val (minCount, minKey) = top
        counts.remove(minKey)
        counts(v) = (minCount + by, minCount + err)
        push(minCount + by, v)
    }
  // note: offer() keeps counts.size <= capacity on every branch (insert
  // only below capacity, otherwise evict-then-insert), so merge needs no
  // post-hoc trim — the eviction tie-break above IS the determinism story.
}

case class ApproxMostFrequentAgg(
    bucketsExpr: Expression,
    value: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  private def intLit(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"approx_most_frequent: $what must be an integer literal, got $other")
  }
  private lazy val buckets: Int = intLit(bucketsExpr, "buckets")
  private lazy val capacity: Int = {
    val c = intLit(capacityExpr, "capacity")
    require(c >= buckets, s"capacity $c must be >= buckets $buckets")
    c
  }

  @transient private lazy val keyOrdering: Ordering[Any] =
    org.apache.spark.sql.catalyst.types.PhysicalDataType.ordering(value.dataType)
      .asInstanceOf[Ordering[Any]]

  override def children: Seq[Expression] = Seq(bucketsExpr, value, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(value.dataType, LongType, valueContainsNull = false)
  override def prettyName: String = "approx_most_frequent"

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity, keyOrdering)

  override def update(state: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = value.eval(input)
    if (v != null) state.offer(InternalRow.copyValue(v))
    state
  }

  override def merge(a: SpaceSavingState, b: SpaceSavingState): SpaceSavingState = {
    b.counts.foreach { case (k, (c, e)) => a.offer(k, c, e) }
    a
  }

  override def eval(state: SpaceSavingState): Any = {
    val top = state.counts.toSeq
      .sortWith { case ((k1, (c1, _)), (k2, (c2, _))) =>
        if (c1 != c2) c1 > c2 else keyOrdering.compare(k1, k2) < 0 }
      .take(buckets)
    ArrayBasedMapData(top.map(_._1).toArray, top.map(_._2._1).toArray)
  }

  override def serialize(state: SpaceSavingState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeInt(state.counts.size)
    state.counts.foreach { case (k, (c, e)) =>
      oos.writeObject(k); oos.writeLong(c); oos.writeLong(e)
    }
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = ois.readInt()
    val state = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val k = ois.readObject(); val c = ois.readLong(); val e = ois.readLong()
      state.counts(k) = (c, e)
      state.offer(k, 0, 0) // re-seed the heap entry; count unchanged
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(o: Int): ApproxMostFrequentAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxMostFrequentAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ApproxMostFrequentAgg =
    copy(bucketsExpr = c(0), value = c(1), capacityExpr = c(2))
}

package graft.functions.sketches

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Map-valued aggregates the reference ships as accumulator classes
  * (operator/aggregation/histogram/Histogram.java,
  * MapAggregationFunction.java, MapUnionAggregation.java,
  * multimapagg/MultimapAggregationFunction.java) — here one
  * TypedImperativeAggregate base with a hash-map buffer; partial/final
  * split and spill-framework integration come from Spark's aggregation
  * machinery for free.
  *
  * Buffers hold *copied* catalyst values (UTF8String et al. are reused by
  * the scan otherwise) and serialize via Java serialization — catalyst
  * value classes are Externalizable/Serializable.
  */
abstract class MapAggBase[V] extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, V]] {

  protected def keyExpr: Expression
  protected def keyType: DataType = keyExpr.dataType
  def valueType: DataType

  override def nullable: Boolean = false
  override def dataType: DataType = MapType(keyType, valueType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, V] =
    mutable.LinkedHashMap.empty[Any, V]

  protected def copyVal(v: Any, t: DataType): Any = InternalRow.copyValue(v)

  override def serialize(buffer: mutable.LinkedHashMap[Any, V]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buffer); oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, V] = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    ois.readObject().asInstanceOf[mutable.LinkedHashMap[Any, V]]
  }

  protected def toMapData(buffer: mutable.LinkedHashMap[Any, V], valueConv: V => Any): Any =
    new ArrayBasedMapData(
      new GenericArrayData(buffer.keys.toArray),
      new GenericArrayData(buffer.values.map(valueConv).toArray))
}

/** histogram(x) → map<x, bigint> of value counts (histogram/Histogram.java:147). */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MapAggBase[Long] {

  override protected def keyExpr: Expression = child
  override def valueType: DataType = LongType
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "histogram"

  override def update(buffer: mutable.LinkedHashMap[Any, Long], input: InternalRow): mutable.LinkedHashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = copyVal(v, keyType)
      buffer.update(k, buffer.getOrElse(k, 0L) + 1L)
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Long], b: mutable.LinkedHashMap[Any, Long]): mutable.LinkedHashMap[Any, Long] = {
    b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
    a
  }

  override def eval(buffer: mutable.LinkedHashMap[Any, Long]): Any =
    toMapData(buffer, identity[Long])

  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistogramAgg =
    copy(child = c.head)
}

/** map_agg(k, v) → map<k, v>, first value wins on duplicate keys
  * (MapAggregationFunction.java:153).
  */
case class MapAggAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MapAggBase[Any] {

  override protected def keyExpr: Expression = key
  override def valueType: DataType = value.dataType
  override def dataType: DataType = MapType(keyType, valueType, valueContainsNull = true)
  override def children: Seq[Expression] = Seq(key, value)
  override def prettyName: String = "map_agg"

  override def update(buffer: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    val k = key.eval(input)
    if (k != null) {
      val kc = copyVal(k, keyType)
      if (!buffer.contains(kc)) {
        val v = value.eval(input)
        buffer.update(kc, if (v == null) null else copyVal(v, valueType))
      }
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Any], b: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    b.foreach { case (k, v) => if (!a.contains(k)) a.update(k, v) }
    a
  }

  override def eval(buffer: mutable.LinkedHashMap[Any, Any]): Any =
    toMapData(buffer, identity[Any])

  override def withNewMutableAggBufferOffset(n: Int): MapAggAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MapAggAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MapAggAgg =
    copy(key = c(0), value = c(1))
}

/** map_union(m) → union of input maps, first value wins on duplicates
  * (MapUnionAggregation.java).
  */
case class MapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MapAggBase[Any] {

  private def mapType: MapType = child.dataType.asInstanceOf[MapType]
  override protected def keyType: DataType = mapType.keyType
  override protected def keyExpr: Expression = child   // unused (keyType overridden)
  override def valueType: DataType = mapType.valueType
  override def dataType: DataType = MapType(keyType, valueType, mapType.valueContainsNull)
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "map_union"

  override def update(buffer: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    child.eval(input) match {
      case null => ()
      case m: org.apache.spark.sql.catalyst.util.MapData =>
        val keys = m.keyArray(); val values = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = copyVal(keys.get(i, keyType), keyType)
          if (!buffer.contains(k)) {
            val v = values.get(i, valueType)
            buffer.update(k, if (v == null) null else copyVal(v, valueType))
          }
          i += 1
        }
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, Any], b: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    b.foreach { case (k, v) => if (!a.contains(k)) a.update(k, v) }
    a
  }

  override def eval(buffer: mutable.LinkedHashMap[Any, Any]): Any =
    toMapData(buffer, identity[Any])

  override def withNewMutableAggBufferOffset(n: Int): MapUnionAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MapUnionAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MapUnionAgg =
    copy(child = c.head)
}

/** multimap_agg(k, v) → map<k, array<v>> (multimapagg/). */
case class MultimapAggAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MapAggBase[mutable.ArrayBuffer[Any]] {

  override protected def keyExpr: Expression = key
  override def valueType: DataType = ArrayType(value.dataType, containsNull = true)
  override def children: Seq[Expression] = Seq(key, value)
  override def prettyName: String = "multimap_agg"

  override def update(buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]], input: InternalRow): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val k = key.eval(input)
    if (k != null) {
      val kc = copyVal(k, keyType)
      val v = value.eval(input)
      buffer.getOrElseUpdate(kc, mutable.ArrayBuffer.empty[Any]) +=
        (if (v == null) null else copyVal(v, value.dataType))
    }
    buffer
  }

  override def merge(a: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]], b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    b.foreach { case (k, vs) =>
      a.getOrElseUpdate(k, mutable.ArrayBuffer.empty[Any]) ++= vs
    }
    a
  }

  override def eval(buffer: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Any =
    toMapData(buffer, (vs: mutable.ArrayBuffer[Any]) => new GenericArrayData(vs.toArray))

  override def withNewMutableAggBufferOffset(n: Int): MultimapAggAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MultimapAggAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MultimapAggAgg =
    copy(key = c(0), value = c(1))
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Map-typed aggregates (reference `operator/aggregation/
  * MapUnionAggregation.java` and `operator/aggregation/multimapagg/`):
  * `map_union(map<K,V>) -> map<K,V>` unions row maps keeping the FIRST
  * value seen for a duplicate key (the reference keeps an arbitrary
  * one — callers needing determinism make the value a function of the
  * key, as the oracle query does), and `multimap_agg(K, V) ->
  * map<K, array<V>>` groups all values under their key.
  *
  * Buffers hold Catalyst values keyed in a LinkedHashMap; spill
  * serialization projects each (key, value) entry through an
  * UnsafeProjection, so any atomic/nested type Spark can shuffle can
  * also be aggregated. Per-group state is O(distinct keys) /
  * O(values), with map-side partial aggregation — the same contract
  * as collect_set. */
abstract class MapAggBase[B] extends TypedImperativeAggregate[B] {

  protected def keyType: DataType
  protected def valueType: DataType

  /** SQL map-key equality (matching Spark's own NormalizeFloatingNumbers
    * treatment), at ANY nesting depth: -0.0 and 0.0 are the same key and
    * all NaN bit patterns collapse to one canonical NaN, including float
    * fields inside struct/array keys. Nested keys are additionally
    * re-projected to canonical UnsafeRow bytes, because Catalyst row
    * representations (UnsafeRow from a scan vs GenericInternalRow from
    * named_struct) do not share equals/hashCode — byte-canonical keys
    * make the LinkedHashMap's equality representation-independent. */
  protected final def normKey(k: Any): Any = k match {
    case null => null
    case d: java.lang.Double => normDouble(d)
    case f: java.lang.Float  => normFloat(f)
    case _ if keyIsNested    =>
      keyRow(0) = normFloats(k, keyType)
      // copy() materializes the projection's reused buffer; get slices
      // the key back out as an UnsafeRow/UnsafeArrayData over canonical
      // bytes, so equal keys are byte-equal regardless of origin.
      InternalRow.copyValue(keyProj(keyRowHolder).copy().get(0, keyType))
    case other => other
  }

  private def normDouble(d: java.lang.Double): java.lang.Double =
    if (d.doubleValue() == 0.0) java.lang.Double.valueOf(0.0)
    else if (d.isNaN) java.lang.Double.valueOf(Double.NaN)
    else d

  private def normFloat(f: java.lang.Float): java.lang.Float =
    if (f.floatValue() == 0.0f) java.lang.Float.valueOf(0.0f)
    else if (f.isNaN) java.lang.Float.valueOf(Float.NaN)
    else f

  @transient private lazy val keyIsNested: Boolean = keyType match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }
  @transient private lazy val keyProj = UnsafeProjection.create(Array(keyType))
  @transient private lazy val keyRow = new Array[Any](1)
  @transient private lazy val keyRowHolder = new GenericInternalRow(keyRow)

  /** Recursive float canonicalization over Catalyst values. */
  private def normFloats(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.lang.Double, _) => normDouble(d)
    case (f: java.lang.Float, _) => normFloat(f)
    case (r: InternalRow, st: StructType) =>
      val out = new Array[Any](st.length)
      var i = 0
      while (i < st.length) {
        out(i) = normFloats(r.get(i, st(i).dataType), st(i).dataType); i += 1
      }
      new GenericInternalRow(out)
    case (a: org.apache.spark.sql.catalyst.util.ArrayData, at: ArrayType) =>
      val out = new Array[Any](a.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = normFloats(a.get(i, at.elementType), at.elementType); i += 1
      }
      new GenericArrayData(out)
    case (m: MapData, mt: MapType) =>
      new ArrayBasedMapData(
        normFloats(m.keyArray(), ArrayType(mt.keyType))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        normFloats(m.valueArray(), ArrayType(mt.valueType))
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    case _ => v
  }

  @transient private lazy val proj =
    UnsafeProjection.create(Array(keyType, valueType))

  protected def writeEntries(pairs: Iterator[(Any, Any)], n: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    val scratch = new Array[Any](2)
    val row = new GenericInternalRow(scratch)
    pairs.foreach { case (k, v) =>
      scratch(0) = k
      scratch(1) = v
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  protected def readEntries(bytes: Array[Byte]): Iterator[(Any, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Iterator.range(0, n).map { _ =>
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(2)
      row.pointTo(buf, len)
      (InternalRow.copyValue(row.get(0, keyType)),
        InternalRow.copyValue(row.get(1, valueType)))
    }
  }
}

/** `map_union(map<K,V>) -> map<K,V>` — first value wins per key. */
case class MapUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapAggBase[mutable.LinkedHashMap[Any, Any]] {

  private lazy val mapType = child.dataType.asInstanceOf[MapType]
  override protected def keyType: DataType = mapType.keyType
  override protected def valueType: DataType = mapType.valueType

  override def dataType: DataType = mapType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, Any],
      input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    child.eval(input) match {
      case m: MapData =>
        val ks = m.keyArray()
        val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = normKey(InternalRow.copyValue(ks.get(i, keyType)))
          if (!b.contains(k))
            b.update(k, InternalRow.copyValue(vs.get(i, valueType)))
          i += 1
        }
      case _ =>
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, Any],
      o: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    o.foreach { case (k, v) => if (!b.contains(k)) b.update(k, v) }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, Any]): Any =
    new ArrayBasedMapData(
      new GenericArrayData(b.keysIterator.toArray),
      new GenericArrayData(b.valuesIterator.toArray))

  override def serialize(b: mutable.LinkedHashMap[Any, Any]): Array[Byte] =
    writeEntries(b.iterator, b.size)
  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val b = createAggregationBuffer()
    readEntries(bytes).foreach { case (k, v) => b.update(k, v) }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MapUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MapUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MapUnionAgg = copy(child = c.head)

  override def prettyName: String = "map_union"
}

/** `multimap_agg(K, V) -> map<K, array<V>>`; value order within a key
  * follows encounter order, so it is partitioning-dependent — sort in
  * the query when determinism matters (the reference's multimap_agg
  * has the same contract). */
case class MultimapAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapAggBase[mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]] {

  override protected def keyType: DataType = key.dataType
  override protected def valueType: DataType = value.dataType

  override def dataType: DataType =
    MapType(keyType, ArrayType(valueType, value.nullable), valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, value)

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
      input: InternalRow): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val k = key.eval(input)
    if (k != null) { // map keys cannot be null (same as the reference)
      val copied = normKey(InternalRow.copyValue(k))
      b.getOrElseUpdate(copied, mutable.ArrayBuffer.empty) +=
        InternalRow.copyValue(value.eval(input))
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
      o: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    o.foreach { case (k, vs) =>
      b.getOrElseUpdate(k, mutable.ArrayBuffer.empty) ++= vs
    }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Any =
    new ArrayBasedMapData(
      new GenericArrayData(b.keysIterator.toArray),
      new GenericArrayData(
        b.valuesIterator.map(vs => new GenericArrayData(vs.toArray)).toArray))

  override def serialize(b: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Array[Byte] =
    writeEntries(
      b.iterator.flatMap { case (k, vs) => vs.iterator.map(v => (k, v)) },
      b.valuesIterator.map(_.size).sum)
  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
    val b = createAggregationBuffer()
    readEntries(bytes).foreach { case (k, v) =>
      b.getOrElseUpdate(k, mutable.ArrayBuffer.empty) += v
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MultimapAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MultimapAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MultimapAgg =
    copy(key = c(0), value = c(1))

  override def prettyName: String = "multimap_agg"
}

/** `map_agg(K, V) -> map<K,V>` (reference
  * `aggregation/MapAggregationFunction.java`): one entry per distinct
  * key, first-encountered value wins on duplicates — which value that
  * is depends on partitioning/merge order, the same
  * arbitrary-on-duplicates contract as the reference. Null keys are
  * ignored (map keys cannot be null); null VALUES are kept. */
case class MapAgg(
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapAggBase[mutable.LinkedHashMap[Any, Any]] {

  override protected def keyType: DataType = key.dataType
  override protected def valueType: DataType = value.dataType

  override def dataType: DataType =
    MapType(keyType, valueType, valueContainsNull = value.nullable)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(key, value)

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, Any],
      input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
    val k = key.eval(input)
    if (k != null) {
      val copied = normKey(InternalRow.copyValue(k))
      if (!b.contains(copied))
        b.update(copied, InternalRow.copyValue(value.eval(input)))
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, Any],
      o: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
    o.foreach { case (k, v) => if (!b.contains(k)) b.update(k, v) }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, Any]): Any =
    new ArrayBasedMapData(
      new GenericArrayData(b.keysIterator.toArray),
      new GenericArrayData(b.valuesIterator.toArray))

  override def serialize(b: mutable.LinkedHashMap[Any, Any]): Array[Byte] =
    writeEntries(b.iterator, b.size)
  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val b = createAggregationBuffer()
    readEntries(bytes).foreach { case (k, v) =>
      if (!b.contains(k)) b.update(k, v)
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MapAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MapAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MapAgg = copy(key = c(0), value = c(1))

  override def prettyName: String = "map_agg"
}

/** `histogram(x) -> map<x, bigint>` — per-value occurrence counts
  * (reference `aggregation/histogram/Histogram.java`): null inputs
  * are ignored, per-group state is O(distinct values) with map-side
  * partial aggregation. Shares the canonical-key machinery of
  * [[MapAggBase]] so float -0.0/NaN and nested keys count as one
  * bucket regardless of row representation. */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MapAggBase[mutable.LinkedHashMap[Any, Long]] {

  override protected def keyType: DataType = child.dataType
  override protected def valueType: DataType =
    org.apache.spark.sql.types.LongType

  override def dataType: DataType =
    MapType(keyType, valueType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Long] =
    mutable.LinkedHashMap.empty

  override def update(b: mutable.LinkedHashMap[Any, Long],
      input: InternalRow): mutable.LinkedHashMap[Any, Long] = {
    val k = child.eval(input)
    if (k != null) {
      val copied = normKey(InternalRow.copyValue(k))
      b.update(copied, b.getOrElse(copied, 0L) + 1L)
    }
    b
  }

  override def merge(b: mutable.LinkedHashMap[Any, Long],
      o: mutable.LinkedHashMap[Any, Long]): mutable.LinkedHashMap[Any, Long] = {
    o.foreach { case (k, n) => b.update(k, b.getOrElse(k, 0L) + n) }
    b
  }

  override def eval(b: mutable.LinkedHashMap[Any, Long]): Any =
    new ArrayBasedMapData(
      new GenericArrayData(b.keysIterator.toArray),
      new GenericArrayData(b.valuesIterator.map(Long.box).toArray))

  override def serialize(b: mutable.LinkedHashMap[Any, Long]): Array[Byte] =
    writeEntries(b.iterator.map { case (k, v) => (k, Long.box(v)) }, b.size)
  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Long] = {
    val b = createAggregationBuffer()
    readEntries(bytes).foreach { case (k, v) =>
      b.update(k, b.getOrElse(k, 0L) + v.asInstanceOf[Long])
    }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): HistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HistogramAgg = copy(child = c.head)

  override def prettyName: String = "histogram"
}

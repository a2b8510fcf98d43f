package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters state (Metwally et al., public
  * algorithm) — the Spark-side equivalent of the reference's
  * `approx_most_frequent` (`operator/aggregation/
  * VarcharApproximateMostFrequent.java`).
  *
  * Keeps at most `capacity` counters; an unseen key evicts the minimum
  * counter and inherits its count (+1), so any key's reported count
  * overestimates its true count by at most n/capacity. When the
  * distinct-value count is ≤ capacity the result is exact. Merge sums
  * counters and re-truncates to capacity — O(capacity) state per
  * partition at any scale.
  */
final class SpaceSaving(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]

  def add(key: String, inc: Long = 1L): Unit =
    counts.get(key) match {
      case Some(c) => counts.update(key, c + inc)
      case None if counts.size < capacity => counts.update(key, inc)
      case None =>
        val (minK, minC) = counts.minBy { case (k, c) => (c, k) }
        counts.remove(minK)
        counts.update(key, minC + inc)
    }

  def merge(o: SpaceSaving): Unit = {
    o.counts.toSeq.sortBy { case (k, c) => (-c, k) }.foreach { case (k, c) => add(k, c) }
    if (counts.size > capacity) {
      val keep = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(capacity)
      counts.clear()
      keep.foreach { case (k, c) => counts.update(k, c) }
    }
  }

  /** Top-k entries ordered by (count desc, key asc). */
  def top(k: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeInt(counts.size)
    counts.toSeq.sortBy(_._1).foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSaving {
  def deserialize(bytes: Array[Byte]): SpaceSaving = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ss = new SpaceSaving(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      ss.counts.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    ss
  }
}

/** `approx_most_frequent(k, string) -> map<string,bigint>` with map
  * entries ordered by (count desc, key asc). Counter capacity is 5k,
  * so the guarantee is: true count ≤ reported ≤ true + n/(5k). */
case class ApproxMostFrequentAgg(
    kExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = MapType(StringType, LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(kExpr, child)

  override def createAggregationBuffer(): SpaceSaving = new SpaceSaving(5 * k)

  override def update(b: SpaceSaving, input: InternalRow): SpaceSaving = {
    val v = child.eval(input)
    if (v != null) b.add(v.toString)
    b
  }

  override def merge(b: SpaceSaving, o: SpaceSaving): SpaceSaving = { b.merge(o); b }

  override def eval(b: SpaceSaving): Any = {
    val entries = b.top(k)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(_._2).toArray[Any]))
  }

  override def serialize(b: SpaceSaving): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSaving = SpaceSaving.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxMostFrequentAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxMostFrequentAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ApproxMostFrequentAgg =
    copy(kExpr = newChildren(0), child = newChildren(1))

  override def prettyName: String = "approx_most_frequent"
}

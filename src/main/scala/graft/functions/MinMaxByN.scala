package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** The reference's N-variant min_by/max_by (reference
  * `operator/aggregation/minmaxbyn/MinMaxByNStateFactory.java` family):
  * `min_by_n(x, y, n) -> array<x>` returns the x values paired with the
  * n smallest y, ascending by y; `max_by_n` the n largest, descending.
  *
  * Per-group state is a bounded heap of at most n (y, x) pairs — O(n)
  * regardless of group size, with map-side partial aggregation — unlike
  * the `array_sort(collect_list(...))[1:n]` composition it replaces,
  * whose buffer grew linearly with the group (multi-GB per group at
  * 100 TB). Rows with a null y are ignored (reference contract); x may
  * be null. Ties on y keep the first-encountered pair, so callers
  * wanting determinism use a unique y (as the gated ag1 query does).
  */
abstract class MinMaxByNBase
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  def valueExpr: Expression // x — emitted
  def keyExpr: Expression   // y — ordered by
  def nExpr: Expression     // bound (foldable)

  /** false → min_by_n (keep n smallest y), true → max_by_n. */
  protected def descending: Boolean

  protected lazy val bound: Int = {
    val v = nExpr.eval(InternalRow.empty)
    require(v != null, s"$prettyName: n must be a non-null literal")
    val n = v.asInstanceOf[Number].intValue()
    require(n > 0 && n <= 10000,
      s"$prettyName: n must be in [1, 10000] (got $n) — the heap is " +
        "per-group driver of memory, same cap as the reference")
    n
  }

  private lazy val baseOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyExpr.dataType)

  /** Heap dequeues the first-to-evict element: the largest kept y for
    * min_by_n, the smallest kept y for max_by_n. Sorting ascending
    * under this same ordering also yields the output order (min →
    * y ascending, max → y descending). Floating NaN keys rank WORST in
    * both directions (reference testMinMaxNFloatingPointNaN: min(x,2)
    * AND max(x,2) of (8.8, NaN) are both [8.8, NaN]) — kept only when
    * the heap has room, emitted last. */
  private lazy val queueOrd: Ordering[Any] = {
    val dir = if (descending) baseOrd.reverse else baseOrd
    val isNan: Any => Boolean = keyExpr.dataType match {
      case org.apache.spark.sql.types.DoubleType =>
        v => v.asInstanceOf[Double].isNaN
      case org.apache.spark.sql.types.FloatType =>
        v => v.asInstanceOf[Float].isNaN
      case _ => null
    }
    if (isNan == null) dir
    else new Ordering[Any] { // NaN = greatest in evict-first order
      override def compare(a: Any, b: Any): Int = {
        val an = isNan(a); val bn = isNan(b)
        if (an && bn) 0 else if (an) 1 else if (bn) -1
        else dir.compare(a, b)
      }
    }
  }

  private lazy val pairOrd: Ordering[(Any, Any)] =
    Ordering.by[(Any, Any), Any](_._1)(queueOrd)

  override def dataType: DataType = ArrayType(valueExpr.dataType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, keyExpr, nExpr)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty(pairOrd)

  private def offer(b: mutable.PriorityQueue[(Any, Any)], k: Any, v: Any): Unit =
    if (b.size < bound) b.enqueue((k, v))
    else if (queueOrd.lt(k, b.head._1)) { b.dequeue(); b.enqueue((k, v)) }

  override def update(b: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val k = keyExpr.eval(input)
    if (k != null) {
      // copy before testing admission is wasted work on rejects — test
      // against the reused buffer first, copy only what enters the heap
      if (b.size < bound || queueOrd.lt(k, b.head._1))
        offer(b, InternalRow.copyValue(k),
          InternalRow.copyValue(valueExpr.eval(input)))
    }
    b
  }

  override def merge(b: mutable.PriorityQueue[(Any, Any)],
      o: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    o.foreach { case (k, v) => offer(b, k, v) }
    b
  }

  override def eval(b: mutable.PriorityQueue[(Any, Any)]): Any =
    new GenericArrayData(b.toSeq.sorted(pairOrd).map(_._2).toArray)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(keyExpr.dataType, valueExpr.dataType))

  override def serialize(b: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val scratch = new Array[Any](2)
    val row = new GenericInternalRow(scratch)
    b.foreach { case (k, v) =>
      scratch(0) = k
      scratch(1) = v
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val b = createAggregationBuffer()
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val row = new UnsafeRow(2)
      row.pointTo(buf, len)
      b.enqueue((InternalRow.copyValue(row.get(0, keyExpr.dataType)),
        InternalRow.copyValue(row.get(1, valueExpr.dataType))))
      i += 1
    }
    b
  }
}

/** `min_by_n(x, y, n)`: x values for the n smallest y, ascending. */
case class MinByN(
    valueExpr: Expression,
    keyExpr: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MinMaxByNBase {

  override protected def descending: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): MinByN =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinByN =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinByN =
    copy(valueExpr = c(0), keyExpr = c(1), nExpr = c(2))

  override def prettyName: String = "min_by_n"
}

/** `max_by_n(x, y, n)`: x values for the n largest y, descending. */
case class MaxByN(
    valueExpr: Expression,
    keyExpr: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MinMaxByNBase {

  override protected def descending: Boolean = true

  override def withNewMutableAggBufferOffset(n: Int): MaxByN =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MaxByN =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MaxByN =
    copy(valueExpr = c(0), keyExpr = c(1), nExpr = c(2))

  override def prettyName: String = "max_by_n"
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types.{DataType, DoubleType, MapType}

/** Streaming equi-weight histogram (Ben-Haim & Tom-Tov, "A Streaming
  * Parallel Decision Tree Algorithm", JMLR 2010 — the published
  * algorithm behind the reference's `NumericHistogramAggregation.java`
  * / `NumericHistogram.java`): at most `buckets` (value, weight)
  * centroids; when full, the two CLOSEST centroids merge into their
  * weighted mean. Exact while distinct values <= buckets (each
  * centroid is then a true value count — the regime the oracle gate
  * pins); approximate but weight-conserving beyond.
  *
  * Scale: O(buckets) state, map-side combinable, merge = concatenate
  * + re-compact — the same contract as the other sketch aggregates.
  */
final class NumericHistogram(val buckets: Int) {

  // sorted centroids: parallel arrays of value and weight
  private var vs = new Array[Double](0)
  private var ws = new Array[Double](0)

  def add(v: Double, w: Double = 1.0): Unit = {
    val i = java.util.Arrays.binarySearch(vs, v)
    if (i >= 0) { ws(i) += w; return }
    val at = -i - 1
    vs = insert(vs, at, v)
    ws = insert(ws, at, w)
    if (vs.length > buckets) compact()
  }

  def merge(o: NumericHistogram): Unit = {
    var i = 0
    while (i < o.vs.length) { add(o.vs(i), o.ws(i)); i += 1 }
  }

  private def insert(a: Array[Double], at: Int, v: Double): Array[Double] = {
    val out = new Array[Double](a.length + 1)
    System.arraycopy(a, 0, out, 0, at)
    out(at) = v
    System.arraycopy(a, at, out, at + 1, a.length - at)
    out
  }

  /** Merge the two closest adjacent centroids (weighted mean). */
  private def compact(): Unit = {
    var best = 0
    var bestGap = Double.MaxValue
    var i = 0
    while (i < vs.length - 1) {
      val gap = vs(i + 1) - vs(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val w = ws(best) + ws(best + 1)
    val v = (vs(best) * ws(best) + vs(best + 1) * ws(best + 1)) / w
    vs(best) = v
    ws(best) = w
    vs = remove(vs, best + 1)
    ws = remove(ws, best + 1)
  }

  private def remove(a: Array[Double], at: Int): Array[Double] = {
    val out = new Array[Double](a.length - 1)
    System.arraycopy(a, 0, out, 0, at)
    System.arraycopy(a, at + 1, out, at, a.length - at - 1)
    out
  }

  def size: Int = vs.length
  def values: Array[Double] = vs.clone()
  def weights: Array[Double] = ws.clone()
  def totalWeight: Double = ws.sum

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buckets)
    out.writeInt(vs.length)
    var i = 0
    while (i < vs.length) { out.writeDouble(vs(i)); out.writeDouble(ws(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object NumericHistogram {
  def deserialize(bytes: Array[Byte]): NumericHistogram = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new NumericHistogram(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { h.add(in.readDouble(), in.readDouble()); i += 1 }
    h
  }
}

/** `numeric_histogram(buckets, value) -> map<double, double>` —
  * sorted centroid→weight map, the reference function's shape. The
  * bucket count must be a foldable integer literal. */
case class NumericHistogramAgg(
    bucketsExpr: Expression,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[NumericHistogram] {

  private lazy val buckets: Int =
    bucketsExpr.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = MapType(DoubleType, DoubleType, false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(bucketsExpr, child)

  override def createAggregationBuffer(): NumericHistogram =
    new NumericHistogram(buckets)

  override def update(b: NumericHistogram, input: InternalRow): NumericHistogram = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
    b
  }

  override def merge(b: NumericHistogram, o: NumericHistogram): NumericHistogram = {
    b.merge(o); b
  }

  override def eval(b: NumericHistogram): Any =
    new ArrayBasedMapData(
      ArrayData.toArrayData(b.values), ArrayData.toArrayData(b.weights))

  override def serialize(b: NumericHistogram): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): NumericHistogram =
    NumericHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): NumericHistogramAgg =
    copy(bucketsExpr = c(0), child = c(1))

  override def prettyName: String = "numeric_histogram"
}

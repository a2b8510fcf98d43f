package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Flat append-only double buffer: the aggregation state of
  * [[ExactQuantiles]]. Update is an array append, merge is an
  * arraycopy, and the single O(n log n) sort happens once at eval —
  * unlike Spark's built-in `percentile`, which maintains a
  * value→count OpenHashMap per partial (hash + probe per row, map
  * union per merge) and measured ~2 s for one 600 k-row pass where
  * this takes ~0.2 s. */
final class DoubleBuffer {
  var arr = new Array[Double](1024)
  var n = 0

  def add(v: Double): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = v
    n += 1
  }

  def merge(o: DoubleBuffer): Unit = {
    if (n + o.n > arr.length)
      arr = java.util.Arrays.copyOf(arr, math.max(n + o.n, arr.length * 2))
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * n + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(arr(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object DoubleBuffer {
  def deserialize(bytes: Array[Byte]): DoubleBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new DoubleBuffer
    val n = in.readInt()
    b.arr = new Array[Double](math.max(n, 1))
    var i = 0
    while (i < n) { b.arr(i) = in.readDouble(); i += 1 }
    b.n = n
    b
  }
}

/** `exact_quantiles(value, array(q, ...)) -> array<double>` — exact
  * interpolated quantiles with the same linear-interpolation contract
  * as Spark's `percentile` (rank q·(n−1), interpolate between the two
  * straddling order statistics), computed by buffer-and-sort instead
  * of hash-counting.
  *
  * SCALE CONTRACT — validation aggregate, not a 100 TB operator: the
  * state is every ingested value (O(n) per group), exactly like the
  * built-in `percentile` it replaces but with ~10× less constant
  * overhead. Its purpose here is pinning the SKETCH aggregates'
  * accuracy inside the gated queries (f3/f6/f7/ag4 compare qdigest/
  * tdigest/approx answers against exact ones). At 100 TB the scalable
  * path is the sketches themselves (O(KB) mergeable state —
  * `QuantileSketch.scala`); an exact quantile there is a sort job,
  * not an aggregate. */
case class ExactQuantiles(
    child: Expression,
    quantiles: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleBuffer] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child, quantiles)

  // the quantile list must be a foldable literal (as with the built-in);
  // literal fractions parse as DECIMAL, so coerce per element
  @transient private lazy val qs: Array[Double] = {
    val arr = quantiles.eval(InternalRow.empty) match {
      case a: ArrayData =>
        val et = quantiles.dataType match {
          case ArrayType(t, _) => t
          case t => t
        }
        a.toObjectArray(et).map(QuantileSketchAgg.toDouble)
      case other => Array(QuantileSketchAgg.toDouble(other))
    }
    // same contract as the built-in percentile: reject out-of-range
    // fractions up front (q in (-1,0) would silently extrapolate
    // below the minimum; q <= -1 would index negatively at eval)
    arr.foreach { q =>
      if (q.isNaN || q < 0.0 || q > 1.0) throw new IllegalArgumentException(
        s"exact_quantiles fraction must be in [0, 1], got $q")
    }
    arr
  }

  override def createAggregationBuffer(): DoubleBuffer = new DoubleBuffer

  override def update(b: DoubleBuffer, input: InternalRow): DoubleBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(QuantileSketchAgg.toDouble(v))
    b
  }

  override def merge(b: DoubleBuffer, o: DoubleBuffer): DoubleBuffer = {
    b.merge(o); b
  }

  override def eval(b: DoubleBuffer): Any = {
    if (b.n == 0) return null
    java.util.Arrays.sort(b.arr, 0, b.n)
    // Spark Percentile.getPercentile semantics: position q·(n−1),
    // linear interpolation between the straddling order statistics
    val out = qs.map { q =>
      val pos = q * (b.n - 1)
      val lo = pos.toInt
      if (lo >= b.n - 1) b.arr(b.n - 1)
      else b.arr(lo) + (pos - lo) * (b.arr(lo + 1) - b.arr(lo))
    }
    new GenericArrayData(out)
  }

  override def serialize(b: DoubleBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): DoubleBuffer =
    DoubleBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactQuantiles =
    copy(child = newChildren(0), quantiles = newChildren(1))

  override def prettyName: String = "exact_quantiles"
}

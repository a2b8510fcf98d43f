package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable log-bucketed quantile sketch (DDSketch-style: relative-
  * error-bounded buckets, public algorithm) — the Spark-side equivalent
  * of the reference's qdigest/tdigest aggregates
  * (`operator/aggregation/QuantileDigestAggregationFunction.java`,
  * `TDigestAggregationFunction.java`, scalars in
  * `scalar/QuantileDigestFunctions.java`).
  *
  * Values map to geometric buckets `ceil(log_gamma |v|)` with
  * γ = (1+α)/(1−α), so any reported quantile is within relative error
  * α of an exact quantile value. Buckets are plain counts → the merge
  * is commutative, associative, and order-independent (bit-identical
  * results on any partitioning — unlike centroid t-digests, which
  * reorder under parallelism). State is O(log(range)/α) regardless of
  * row count: at 100 TB each executor carries a few KB and the final
  * merge is one reduce — this is THE distributed percentile design.
  */
final class LogQuantileSketch(val alpha: Double) {
  val gamma: Double = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  val pos = new mutable.HashMap[Int, Long]
  val neg = new mutable.HashMap[Int, Long]
  var zeros: Long = 0L

  private def bucketOf(v: Double): Int = math.ceil(math.log(v) / logGamma).toInt

  /** Representative value of bucket i: the mid-point estimator
    * 2γ^i/(γ+1) that realizes the α bound. */
  private def repOf(i: Int): Double = 2 * math.pow(gamma, i) / (gamma + 1)

  def add(v: Double): Unit =
    if (v > 0) pos.update(bucketOf(v), pos.getOrElse(bucketOf(v), 0L) + 1)
    else if (v < 0) neg.update(bucketOf(-v), neg.getOrElse(bucketOf(-v), 0L) + 1)
    else zeros += 1

  def merge(o: LogQuantileSketch): Unit = {
    o.pos.foreach { case (k, c) => pos.update(k, pos.getOrElse(k, 0L) + c) }
    o.neg.foreach { case (k, c) => neg.update(k, neg.getOrElse(k, 0L) + c) }
    zeros += o.zeros
  }

  def count: Long = pos.valuesIterator.sum + neg.valuesIterator.sum + zeros

  /** Value at quantile q in [0,1]: walk negatives (descending bucket =
    * ascending value), zeros, then positives ascending. */
  def quantile(q: Double): Double = {
    val n = count
    if (n == 0) return Double.NaN
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L
    for ((k, c) <- neg.toSeq.sortBy(-_._1)) {
      seen += c
      if (seen >= rank) return -repOf(k)
    }
    seen += zeros
    if (seen >= rank) return 0.0
    for ((k, c) <- pos.toSeq.sortBy(_._1)) {
      seen += c
      if (seen >= rank) return repOf(k)
    }
    Double.NaN
  }

  /** Rank fraction of value v (inverse of [[quantile]], reference
    * QuantileDigestFunctions quantile_at_value): share of ingested
    * values whose bucket representative is <= v. */
  def rankOf(v: Double): Double = {
    val n = count
    if (n == 0) return Double.NaN
    var seen = 0L
    for ((k, c) <- neg) if (-repOf(k) <= v) seen += c
    if (0.0 <= v) seen += zeros
    for ((k, c) <- pos) if (repOf(k) <= v) seen += c
    seen.toDouble / n
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(alpha)
    out.writeLong(zeros)
    def writeMap(m: mutable.HashMap[Int, Long]): Unit = {
      out.writeInt(m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, c) => out.writeInt(k); out.writeLong(c) }
    }
    writeMap(pos); writeMap(neg)
    out.flush()
    bos.toByteArray
  }
}

object LogQuantileSketch {
  val DefaultAlpha = 0.01

  def deserialize(bytes: Array[Byte]): LogQuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new LogQuantileSketch(in.readDouble())
    sk.zeros = in.readLong()
    def readMap(m: mutable.HashMap[Int, Long]): Unit = {
      val n = in.readInt()
      var i = 0
      while (i < n) { m.update(in.readInt(), in.readLong()); i += 1 }
    }
    readMap(sk.pos); readMap(sk.neg)
    sk
  }
}

/** `qdigest_agg(double) -> binary` — mergeable sketch aggregate. */
case class QuantileSketchAgg(
    child: Expression,
    alpha: Double = LogQuantileSketch.DefaultAlpha,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LogQuantileSketch] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): LogQuantileSketch =
    new LogQuantileSketch(alpha)

  override def update(b: LogQuantileSketch, input: InternalRow): LogQuantileSketch = {
    val v = child.eval(input)
    if (v != null) b.add(QuantileSketchAgg.toDouble(v))
    b
  }

  override def merge(b: LogQuantileSketch, o: LogQuantileSketch): LogQuantileSketch = {
    b.merge(o); b
  }

  override def eval(b: LogQuantileSketch): Any = b.serialize()
  override def serialize(b: LogQuantileSketch): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): LogQuantileSketch =
    LogQuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "qdigest_agg"
}

object QuantileSketchAgg {
  /** Numeric coercion without ExpectsInputTypes (AbstractDataType is
    * private[sql], so analyzer-side coercion isn't available to
    * third-party expressions). */
  def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case dec: Decimal => dec.toDouble
    case n: Number => n.doubleValue()
  }
}

/** `value_at_quantile(binary, double) -> double` — query a serialized
  * sketch (reference: `scalar/QuantileDigestFunctions.java` and
  * `scalar/TDigestFunctions.java`; the reference overloads on the
  * sketch's SQL type, here dispatch is on the serialization tag). */
case class ValueAtQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, q: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val qq = QuantileSketchAgg.toDouble(q)
    if (TDigest.isTDigest(bytes)) TDigest.deserialize(bytes).quantile(qq)
    else LogQuantileSketch.deserialize(bytes).quantile(qq)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValueAtQuantile =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "value_at_quantile"
}

/** `quantile_at_value(qdigest_binary, x) -> rank fraction` (reference
  * QuantileDigestFunctions.quantile_at_value — the inverse of
  * value_at_quantile). */
case class QuantileAtValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    LogQuantileSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
      .rankOf(QuantileSketchAgg.toDouble(v))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileAtValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantile_at_value"
}

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
/** Common surface of the qdigest family — the reference's qdigest is
  * PARAMETRIC over bigint/real/double
  * (`QuantileDigestAggregationFunction.java` binds one implementation
  * per argument type); here the aggregate picks the implementation
  * from the child's Catalyst type and the scalars dispatch on the
  * serialization tag. */
sealed trait QuantileDigest {
  def addAny(v: Any): Unit
  /** Weighted insert (the reference's qdigest_agg(v, w) overload,
    * `QuantileDigestAggregationFunction.java`). Concrete sketches
    * override with O(1) count bumps; the fallback loop is only the
    * safety net. */
  def addAnyN(v: Any, n: Long): Unit = {
    var i = 0L
    while (i < n) { addAny(v); i += 1 }
  }
  def isEmptyDigest: Boolean
  def mergeDigest(o: QuantileDigest): Unit
  def serialize(): Array[Byte]
  def quantile(q: Double): Double
  def rankOf(v: Double): Double
}

object QuantileDigest {
  /** Tag-dispatched deserialize across the whole sketch family. */
  def deserialize(bytes: Array[Byte]): QuantileDigest =
    if (LongExactQuantileSketch.isLongDigest(bytes))
      LongExactQuantileSketch.deserialize(bytes)
    else if (FloatExactQuantileSketch.isFloatDigest(bytes))
      FloatExactQuantileSketch.deserialize(bytes)
    else LogQuantileSketch.deserialize(bytes)
}

final class LogQuantileSketch(val alpha: Double) extends QuantileDigest {
  val gamma: Double = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  val pos = new mutable.HashMap[Int, Long]
  val neg = new mutable.HashMap[Int, Long]
  var zeros: Long = 0L

  private def bucketOf(v: Double): Int = math.ceil(math.log(v) / logGamma).toInt

  /** Representative value of bucket i: the mid-point estimator
    * 2γ^i/(γ+1) that realizes the α bound. */
  private def repOf(i: Int): Double = 2 * math.pow(gamma, i) / (gamma + 1)

  def add(v: Double): Unit = add(v, 1L)

  /** Weighted insert: bucket count += c in O(1). Degradation and
    * exact→approx merges use this so their cost is O(distinct values),
    * not O(total ingested rows). */
  def add(v: Double, c: Long): Unit =
    if (v > 0) pos.update(bucketOf(v), pos.getOrElse(bucketOf(v), 0L) + c)
    else if (v < 0) neg.update(bucketOf(-v), neg.getOrElse(bucketOf(-v), 0L) + c)
    else zeros += c

  override def addAny(v: Any): Unit = add(QuantileSketchAgg.toDouble(v))
  override def addAnyN(v: Any, n: Long): Unit =
    add(QuantileSketchAgg.toDouble(v), n)
  override def isEmptyDigest: Boolean = pos.isEmpty && neg.isEmpty && zeros == 0
  override def mergeDigest(o: QuantileDigest): Unit = o match {
    case s: LogQuantileSketch => merge(s)
    case other => throw new IllegalArgumentException(
      s"cannot merge ${other.getClass.getSimpleName} into a double qdigest")
  }

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

/** Bigint qdigest: exact value→count map while the group's distinct
  * count stays within `maxExact` (the reference's integer qdigest is
  * likewise exact until its compression budget forces collapse —
  * `io.airlift.stats.QuantileDigest` stores exact values at low
  * cardinality), degrading in place to the log-bucket approximation
  * past the budget. Quantiles in exact mode are true order
  * statistics (rank `max(1, ceil(q·n))`, the same step-quantile walk
  * as the bucket path) and return the ingested integer itself.
  *
  * 100 TB note: state is bounded at `maxExact` entries (64 KB) before
  * degradation and O(log(range)/α) after — mergeable either way, so
  * the two-level sketch-then-merge pattern holds unchanged. */
final class LongExactQuantileSketch(val maxExact: Int = LongExactQuantileSketch.DefaultMaxExact)
    extends QuantileDigest {
  import LongExactQuantileSketch.Magic

  val counts = new mutable.HashMap[Long, Long]
  var approx: LogQuantileSketch = null // non-null once degraded

  def add(v: Long): Unit = add(v, 1L)

  def add(v: Long, c: Long): Unit =
    if (approx != null) approx.add(v.toDouble, c)
    else {
      counts.update(v, counts.getOrElse(v, 0L) + c)
      if (counts.size > maxExact) degrade()
    }

  private def degrade(): Unit = {
    approx = new LogQuantileSketch(LogQuantileSketch.DefaultAlpha)
    for ((v, c) <- counts) approx.add(v.toDouble, c)
    counts.clear()
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case n: Number => n.longValue()
  }

  override def addAny(v: Any): Unit = add(asLong(v))
  override def addAnyN(v: Any, n: Long): Unit = add(asLong(v), n)
  override def isEmptyDigest: Boolean =
    counts.isEmpty && (approx == null || approx.isEmptyDigest)

  override def mergeDigest(o: QuantileDigest): Unit = o match {
    case s: LongExactQuantileSketch =>
      if (s.approx != null) { if (approx == null) degrade(); approx.merge(s.approx) }
      else if (approx != null) for ((v, c) <- s.counts) approx.add(v.toDouble, c)
      else {
        s.counts.foreach { case (v, c) => counts.update(v, counts.getOrElse(v, 0L) + c) }
        if (counts.size > maxExact) degrade()
      }
    case other => throw new IllegalArgumentException(
      s"cannot merge ${other.getClass.getSimpleName} into a bigint qdigest")
  }

  def count: Long =
    if (approx != null) approx.count else counts.valuesIterator.sum

  override def quantile(q: Double): Double = {
    if (approx != null) return math.rint(approx.quantile(q))
    val n = count
    if (n == 0) return Double.NaN
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L
    for ((v, c) <- counts.toSeq.sortBy(_._1)) {
      seen += c
      if (seen >= rank) return v.toDouble
    }
    Double.NaN
  }

  override def rankOf(v: Double): Double = {
    if (approx != null) return approx.rankOf(v)
    val n = count
    if (n == 0) return Double.NaN
    var seen = 0L
    for ((k, c) <- counts) if (k <= v) seen += c
    seen.toDouble / n
  }

  override def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeBoolean(approx == null)
    if (approx == null) {
      out.writeInt(counts.size)
      counts.toSeq.sortBy(_._1).foreach { case (v, c) =>
        out.writeLong(v); out.writeLong(c)
      }
    } else out.write(approx.serialize())
    out.flush()
    bos.toByteArray
  }
}

object LongExactQuantileSketch {
  val DefaultMaxExact = 4096
  val Magic: Int = 0x51444C31 // "QDL1"

  def isLongDigest(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xff) << 24 | (bytes(1) & 0xff) << 16 |
        (bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) == Magic

  def deserialize(bytes: Array[Byte]): LongExactQuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a bigint qdigest")
    val sk = new LongExactQuantileSketch()
    if (in.readBoolean()) {
      val n = in.readInt()
      var i = 0
      while (i < n) { sk.counts.update(in.readLong(), in.readLong()); i += 1 }
    } else {
      // Header is 5 bytes (4-byte magic + 1-byte boolean); the stream is
      // already positioned at the embedded LogQuantileSketch payload.
      sk.approx = LogQuantileSketch.deserialize(in.readAllBytes())
    }
    sk
  }
}

/** REAL (float32) qdigest — the third binding of the reference's
  * parametric qdigest (`QuantileDigestAggregationFunction.java` binds
  * bigint/real/double separately): exact float→count map while the
  * group's distinct count stays within `maxExact`, degrading in place
  * to the log-bucket approximation past the budget — same shape as the
  * bigint digest, but over the float lattice (quantiles in exact mode
  * return the ingested float32 value itself, widened losslessly to
  * double). Merge/serde contract identical; tag "QDF1". */
final class FloatExactQuantileSketch(val maxExact: Int = LongExactQuantileSketch.DefaultMaxExact)
    extends QuantileDigest {
  import FloatExactQuantileSketch.Magic

  val counts = new mutable.HashMap[Float, Long]
  var approx: LogQuantileSketch = null // non-null once degraded

  def add(v: Float): Unit = add(v, 1L)

  def add(v: Float, c: Long): Unit =
    if (approx != null) approx.add(v.toDouble, c)
    else {
      counts.update(v, counts.getOrElse(v, 0L) + c)
      if (counts.size > maxExact) degrade()
    }

  private def degrade(): Unit = {
    approx = new LogQuantileSketch(LogQuantileSketch.DefaultAlpha)
    for ((v, c) <- counts) approx.add(v.toDouble, c)
    counts.clear()
  }

  private def asFloat(v: Any): Float = v match {
    case f: Float => f
    case n: Number => n.floatValue()
  }

  override def addAny(v: Any): Unit = add(asFloat(v))
  override def addAnyN(v: Any, n: Long): Unit = add(asFloat(v), n)
  override def isEmptyDigest: Boolean =
    counts.isEmpty && (approx == null || approx.isEmptyDigest)

  override def mergeDigest(o: QuantileDigest): Unit = o match {
    case s: FloatExactQuantileSketch =>
      if (s.approx != null) { if (approx == null) degrade(); approx.merge(s.approx) }
      else if (approx != null) for ((v, c) <- s.counts) approx.add(v.toDouble, c)
      else {
        s.counts.foreach { case (v, c) => counts.update(v, counts.getOrElse(v, 0L) + c) }
        if (counts.size > maxExact) degrade()
      }
    case other => throw new IllegalArgumentException(
      s"cannot merge ${other.getClass.getSimpleName} into a real qdigest")
  }

  def count: Long =
    if (approx != null) approx.count else counts.valuesIterator.sum

  override def quantile(q: Double): Double = {
    if (approx != null) return approx.quantile(q)
    val n = count
    if (n == 0) return Double.NaN
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var seen = 0L
    for ((v, c) <- counts.toSeq.sortBy(_._1)) {
      seen += c
      if (seen >= rank) return v.toDouble
    }
    Double.NaN
  }

  override def rankOf(v: Double): Double = {
    if (approx != null) return approx.rankOf(v)
    val n = count
    if (n == 0) return Double.NaN
    var seen = 0L
    for ((k, c) <- counts) if (k.toDouble <= v) seen += c
    seen.toDouble / n
  }

  override def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeBoolean(approx == null)
    if (approx == null) {
      out.writeInt(counts.size)
      counts.toSeq.sortBy(_._1).foreach { case (v, c) =>
        out.writeFloat(v); out.writeLong(c)
      }
    } else out.write(approx.serialize())
    out.flush()
    bos.toByteArray
  }
}

object FloatExactQuantileSketch {
  val Magic: Int = 0x51444631 // "QDF1"

  def isFloatDigest(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xff) << 24 | (bytes(1) & 0xff) << 16 |
        (bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) == Magic

  def deserialize(bytes: Array[Byte]): FloatExactQuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a real qdigest")
    val sk = new FloatExactQuantileSketch()
    if (in.readBoolean()) {
      val n = in.readInt()
      var i = 0
      while (i < n) { sk.counts.update(in.readFloat(), in.readLong()); i += 1 }
    } else {
      // Header is 5 bytes (4-byte magic + 1-byte boolean); the stream is
      // already positioned at the embedded LogQuantileSketch payload.
      sk.approx = LogQuantileSketch.deserialize(in.readAllBytes())
    }
    sk
  }
}

/** `qdigest_agg(numeric) -> binary` — mergeable sketch aggregate,
  * parametric like the reference's: integral children get the
  * exact-at-low-cardinality bigint digest, float children the
  * exact-at-low-cardinality real digest, double/decimal children the
  * log-bucket sketch. */
case class QuantileSketchAgg(
    child: Expression,
    alpha: Double = LogQuantileSketch.DefaultAlpha,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileDigest] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty input -> NULL
  override def children: Seq[Expression] = Seq(child) ++ weight

  private def isIntegral = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def createAggregationBuffer(): QuantileDigest =
    if (isIntegral) new LongExactQuantileSketch()
    else if (child.dataType == FloatType) new FloatExactQuantileSketch()
    else new LogQuantileSketch(alpha)

  override def update(b: QuantileDigest, input: InternalRow): QuantileDigest = {
    val v = child.eval(input)
    if (v != null) weight match {
      case None => b.addAny(v)
      case Some(w) =>
        val wv = w.eval(input)
        if (wv != null) {
          val n = wv.asInstanceOf[Number].longValue()
          // reference QuantileDigestFunctions.verifyWeight: a zero or
          // negative weight would silently corrupt the sketch
          // (negative counts decrement buckets) — fail loud instead
          if (n <= 0) throw new IllegalArgumentException(
            s"percentile weight must be > 0: $n")
          b.addAnyN(v, n)
        }
    }
    b
  }

  override def merge(b: QuantileDigest, o: QuantileDigest): QuantileDigest = {
    b.mergeDigest(o); b
  }

  // aggregate-over-nothing is NULL, not an empty sketch
  override def eval(b: QuantileDigest): Any =
    if (b.isEmptyDigest) null else b.serialize()
  override def serialize(b: QuantileDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileDigest =
    QuantileDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)

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
    else QuantileDigest.deserialize(bytes).quantile(qq)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValueAtQuantile =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "value_at_quantile"
}

/** `values_at_quantiles(binary, array<double>) -> array<double>` —
  * the reference's batch form (`QuantileDigestFunctions.java:65-102`,
  * parametric over the digest's bound type): ONE sketch deserialize
  * serves every requested quantile, vs one per call with
  * value_at_quantile — the cheap way to ask for p25/p50/p75 together. */
case class ValuesAtQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(sketch: Any, qs: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val arr = qs.asInstanceOf[ArrayData]
    // the percentile array may arrive as int/decimal/double literals —
    // coerce per element (no analyzer-side cast without the
    // private[sql] AbstractDataType)
    val elemType = right.dataType.asInstanceOf[ArrayType].elementType
    def qAt(i: Int): Double =
      QuantileSketchAgg.toDouble(arr.get(i, elemType))
    // reference contract (TDigestFunctions.valuesAtQuantiles)
    var j = 1
    while (j < arr.numElements()) {
      require(qAt(j - 1) <= qAt(j),
        "percentiles must be sorted in increasing order")
      j += 1
    }
    val out = new Array[Double](arr.numElements())
    if (TDigest.isTDigest(bytes)) {
      val d = TDigest.deserialize(bytes)
      var i = 0
      while (i < out.length) { out(i) = d.quantile(qAt(i)); i += 1 }
    } else {
      val d = QuantileDigest.deserialize(bytes)
      var i = 0
      while (i < out.length) { out(i) = d.quantile(qAt(i)); i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ValuesAtQuantiles =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "values_at_quantiles"
}

/** `quantile_at_value(qdigest_binary, x) -> rank fraction` (reference
  * QuantileDigestFunctions.quantile_at_value — the inverse of
  * value_at_quantile). */
case class QuantileAtValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, v: Any): Any =
    QuantileDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
      .rankOf(QuantileSketchAgg.toDouble(v))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileAtValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantile_at_value"
}

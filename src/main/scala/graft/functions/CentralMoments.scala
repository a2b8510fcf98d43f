package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Streaming central moments (n, mean, M2, M3, M4) with the standard
  * one-pass update and pairwise merge equations (Pébay, "Formulas for
  * Robust, One-Pass Parallel Computation of Covariances and
  * Arbitrary-Order Statistical Moments", SAND2008-6212) — the same
  * published formulas behind the reference's
  * `CentralMomentsAggregation.java` state.
  *
  * This exists because the reference's OUTPUT contract differs from
  * Spark's builtins (reference `operator/aggregation/
  * CentralMomentsAggregation.java`, tests
  * `TestDoubleSkewnessAggregation` / `TestLongKurtosisAggregation`):
  *
  *   - `skewness` = sqrt(n) · M3 / M2^1.5 — same value as Spark for
  *     n ≥ 3, but NULL when n < 3 (Spark returns 0/NaN);
  *   - `kurtosis` = the SAMPLE-adjusted excess kurtosis
  *     (n-1)n(n+1)/((n-2)(n-3)) · M4/M2² − 3(n-1)²/((n-2)(n-3)),
  *     NULL when n < 4 — Spark's builtin is the population form
  *     n·M4/M2² − 3, a DIFFERENT VALUE at every n.
  *
  * The dialect renames reference-SQL skewness/kurtosis onto these, so
  * translated queries get the reference's numbers; Spark-API users
  * keep Spark's builtins untouched.
  */
final class MomentsState {
  var n: Long = 0L
  var mean: Double = 0.0
  var m2: Double = 0.0
  var m3: Double = 0.0
  var m4: Double = 0.0

  def add(x: Double): Unit = {
    val n1 = n
    n += 1
    val delta = x - mean
    val deltaN = delta / n
    val deltaN2 = deltaN * deltaN
    val term1 = delta * deltaN * n1
    mean += deltaN
    m4 += term1 * deltaN2 * (n * n - 3L * n + 3L) + 6.0 * deltaN2 * m2 -
      4.0 * deltaN * m3
    m3 += term1 * deltaN * (n - 2L) - 3.0 * deltaN * m2
    m2 += term1
  }

  def merge(o: MomentsState): Unit = {
    if (o.n == 0) return
    if (n == 0) {
      n = o.n; mean = o.mean; m2 = o.m2; m3 = o.m3; m4 = o.m4
      return
    }
    val na = n.toDouble
    val nb = o.n.toDouble
    val nt = na + nb
    val delta = o.mean - mean
    val d2 = delta * delta
    val newM4 = m4 + o.m4 +
      d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (nt * nt * nt) +
      6.0 * d2 * (na * na * o.m2 + nb * nb * m2) / (nt * nt) +
      4.0 * delta * (na * o.m3 - nb * m3) / nt
    val newM3 = m3 + o.m3 + delta * d2 * na * nb * (na - nb) / (nt * nt) +
      3.0 * delta * (na * o.m2 - nb * m2) / nt
    val newM2 = m2 + o.m2 + d2 * na * nb / nt
    mean = (na * mean + nb * o.mean) / nt
    n += o.n
    m2 = newM2
    m3 = newM3
    m4 = newM4
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n); out.writeDouble(mean)
    out.writeDouble(m2); out.writeDouble(m3); out.writeDouble(m4)
    out.flush()
    bos.toByteArray
  }
}

object MomentsState {
  def deserialize(bytes: Array[Byte]): MomentsState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MomentsState
    s.n = in.readLong(); s.mean = in.readDouble()
    s.m2 = in.readDouble(); s.m3 = in.readDouble(); s.m4 = in.readDouble()
    s
  }
}

/** `graft_skewness(x)` / `graft_kurtosis(x)` — reference-contract
  * outputs over [[MomentsState]] (`isKurtosis` selects which). */
case class CentralMomentsAgg(
    child: Expression,
    isKurtosis: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsState] with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  // decimal/integral inputs coerce to double at analysis (the
  // reference accepts them via implicit numeric coercion —
  // `CentralMomentsAggregation.java` takes DOUBLE); non-numeric
  // inputs fail analysis instead of ClassCastException at runtime.
  // Declared Seq[DataType] — AbstractDataType is private[sql].
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def createAggregationBuffer(): MomentsState = new MomentsState

  override def update(b: MomentsState, input: InternalRow): MomentsState = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: MomentsState, o: MomentsState): MomentsState = {
    b.merge(o); b
  }

  override def eval(b: MomentsState): Any =
    if (isKurtosis) {
      if (b.n < 4) null
      else {
        val n = b.n.toDouble
        Double.box(
          ((n - 1) * n * (n + 1)) / ((n - 2) * (n - 3)) * b.m4 / (b.m2 * b.m2)
            - 3.0 * ((n - 1) * (n - 1)) / ((n - 2) * (n - 3)))
      }
    } else {
      if (b.n < 3) null
      else Double.box(
        math.sqrt(b.n.toDouble) * b.m3 / math.pow(b.m2, 1.5))
    }

  override def serialize(b: MomentsState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MomentsState =
    MomentsState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): CentralMomentsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CentralMomentsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CentralMomentsAgg =
    copy(child = c.head)

  override def prettyName: String =
    if (isKurtosis) "graft_kurtosis" else "graft_skewness"
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Merging t-digest (Dunning & Ertl's published algorithm) — the
  * engine's analogue of the reference's distinct TDigest type
  * (`operator/aggregation/TDigestAggregationFunction.java`, scalars in
  * `operator/scalar/TDigestFunctions.java` incl. trimmed_mean),
  * complementing the log-bucket [[LogQuantileSketch]] which keeps the
  * qdigest role: the t-digest's error is bounded in RANK (tightest at
  * the tails, scale-free in value), the log-bucket sketch's in relative
  * VALUE — the same split of error profiles the reference offers.
  *
  * Centroids are (mean, weight) pairs merged greedily under the k1
  * scale function k(q) = δ/2π·asin(2q−1), which caps a centroid's
  * weight share near the tails at O(q(1−q)/δ) — so extreme quantiles
  * stay sharp. State is O(δ) regardless of row count; merge
  * re-compresses, so at 100 TB each task carries a few KB of
  * centroids and partial aggregation does the heavy lifting. Unlike
  * the count-bucket sketches the result depends (within the rank
  * bound) on merge order, so the oracle gate pins error-bound
  * BOOLEANS, not raw values (the established sketch protocol).
  */
final class TDigest(val compression: Double) {

  private val bufCap = 2048
  private var cMeans = new Array[Double](0) // sorted by mean after compress
  private var cWeights = new Array[Double](0)
  private var nC = 0
  private val bMeans = new Array[Double](bufCap)
  private val bWeights = new Array[Double](bufCap)
  private var nB = 0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  private def kFn(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  private def kInv(k: Double): Double =
    (math.sin(math.min(compression / 4, math.max(-compression / 4, k)) *
      2 * math.Pi / compression) + 1) / 2

  def add(v: Double, w: Double = 1.0): Unit = {
    if (nB == bufCap) compress()
    bMeans(nB) = v
    bWeights(nB) = w
    nB += 1
    if (v < min) min = v
    if (v > max) max = v
  }

  def merge(o: TDigest): Unit = {
    o.compress()
    var i = 0
    while (i < o.nC) { add(o.cMeans(i), o.cWeights(i)); i += 1 }
    min = math.min(min, o.min)
    max = math.max(max, o.max)
  }

  def isEmpty: Boolean = nC == 0 && nB == 0

  def totalWeight: Double = {
    var s = 0.0
    var i = 0
    while (i < nC) { s += cWeights(i); i += 1 }
    i = 0
    while (i < nB) { s += bWeights(i); i += 1 }
    s
  }

  def centroidCount: Int = { compress(); nC }

  /** Greedy merge of buffered points + existing centroids under the
    * k1 size bound (one pass over the sorted sequence). */
  def compress(): Unit = {
    if (nB == 0) return
    val m = nC + nB
    // primitive parallel arrays end-to-end: compress runs every
    // `bufCap` adds on the per-row hot path, so a boxed tuple per
    // point (the obvious sortBy shape) costs an allocation storm —
    // m tuples + a boxing comparator per compress, ~1M allocations
    // per 600k-row aggregation. Sort means and co-permute weights
    // with an in-place quicksort on the two arrays instead.
    val ms = new Array[Double](m)
    val ws = new Array[Double](m)
    System.arraycopy(cMeans, 0, ms, 0, nC)
    System.arraycopy(cWeights, 0, ws, 0, nC)
    System.arraycopy(bMeans, 0, ms, nC, nB)
    System.arraycopy(bWeights, 0, ws, nC, nB)
    sortPairs(ms, ws, 0, m - 1)
    var w = 0.0
    var i = 0
    while (i < m) { w += ws(i); i += 1 }
    val outM = new Array[Double](m)
    val outW = new Array[Double](m)
    var nOut = 0
    var curMean = ms(0)
    var curW = ws(0)
    var wSoFar = 0.0
    var limit = w * kInv(kFn(0.0) + 1.0)
    i = 1
    while (i < m) {
      val mi = ms(i)
      val wi = ws(i)
      if (wSoFar + curW + wi <= limit) {
        curMean += (mi - curMean) * wi / (curW + wi)
        curW += wi
      } else {
        outM(nOut) = curMean
        outW(nOut) = curW
        nOut += 1
        wSoFar += curW
        limit = w * kInv(kFn(wSoFar / w) + 1.0)
        curMean = mi
        curW = wi
      }
      i += 1
    }
    outM(nOut) = curMean
    outW(nOut) = curW
    nOut += 1
    cMeans = java.util.Arrays.copyOf(outM, nOut)
    cWeights = java.util.Arrays.copyOf(outW, nOut)
    nC = nOut
    nB = 0
  }

  /** In-place quicksort of `ms[lo..hi]` co-permuting `ws` (median-of-3
    * pivot, insertion sort below 16 — NaN-free input: means are real
    * data values). */
  private def sortPairs(ms: Array[Double], ws: Array[Double], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (hi - lo >= 16) {
      val mid = lo + (hi - lo) / 2
      // median-of-3 into ms(mid)
      if (ms(lo) > ms(mid)) { swap(ms, ws, lo, mid) }
      if (ms(lo) > ms(hi)) { swap(ms, ws, lo, hi) }
      if (ms(mid) > ms(hi)) { swap(ms, ws, mid, hi) }
      val p = ms(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (ms(i) < p) i += 1
        while (ms(j) > p) j -= 1
        if (i <= j) { swap(ms, ws, i, j); i += 1; j -= 1 }
      }
      // recurse into the smaller side, loop on the larger
      if (j - lo < hi - i) { sortPairs(ms, ws, lo, j); lo = i }
      else { sortPairs(ms, ws, i, hi); hi = j }
    }
    var i = lo + 1
    while (i <= hi) {
      val m = ms(i)
      val w = ws(i)
      var j = i - 1
      while (j >= lo && ms(j) > m) { ms(j + 1) = ms(j); ws(j + 1) = ws(j); j -= 1 }
      ms(j + 1) = m
      ws(j + 1) = w
      i += 1
    }
  }

  @inline private def swap(ms: Array[Double], ws: Array[Double], a: Int, b: Int): Unit = {
    val tm = ms(a); ms(a) = ms(b); ms(b) = tm
    val tw = ws(a); ws(a) = ws(b); ws(b) = tw
  }

  /** Value at rank-quantile q: linear interpolation between centroid
    * centers, anchored at the observed min/max at the extremes. */
  def quantile(q: Double): Double = {
    compress()
    if (nC == 0) return Double.NaN
    val w = totalWeight
    val target = math.min(1.0, math.max(0.0, q)) * w
    // Discrete regime: every centroid is a weight-1 singleton (no
    // merging has happened), so the digest holds the exact value set —
    // return the reference's step-function answer (the first value
    // whose cumulative weight EXCEEDS q·n; TestTDigestFunctions
    // testValueAtQuantile pins 0.75 over {.1,.2,.3,.4} → .4).
    // Interpolation only applies once centroids actually approximate.
    if (w == nC.toDouble) {
      var cum = 0.0
      var i = 0
      while (i < nC) {
        cum += cWeights(i)
        if (cum > target) return cMeans(i)
        i += 1
      }
      return max
    }
    if (nC == 1) {
      // Interpolate through min / centroid mean / max, as the
      // multi-centroid tails do, so quantile(0)=min and quantile(1)=max
      // even when every value landed in one centroid.
      val half = w / 2
      return if (target <= half)
        min + (if (half <= 0) 0.0 else target / half) * (cMeans(0) - min)
      else
        cMeans(0) + (if (w - half <= 0) 0.0
          else (target - half) / (w - half)) * (max - cMeans(0))
    }
    val firstHalf = cWeights(0) / 2
    if (target <= firstHalf)
      return min + (if (firstHalf <= 0) 0.0 else target / firstHalf) * (cMeans(0) - min)
    var cum = 0.0
    var i = 0
    while (i < nC - 1) {
      val center = cum + cWeights(i) / 2
      val nextCenter = cum + cWeights(i) + cWeights(i + 1) / 2
      if (target <= nextCenter) {
        if (target <= center || nextCenter == center) return cMeans(i)
        val t = (target - center) / (nextCenter - center)
        return cMeans(i) + t * (cMeans(i + 1) - cMeans(i))
      }
      cum += cWeights(i)
      i += 1
    }
    val lastCenter = cum + cWeights(nC - 1) / 2
    val span = w - lastCenter
    if (span <= 0) max
    else cMeans(nC - 1) +
      math.min(1.0, (target - lastCenter) / span) * (max - cMeans(nC - 1))
  }

  /** Mean of the values between rank-quantiles lo and hi (reference
    * TDigestFunctions.trimmed_mean): centroids contribute the weight
    * share of their rank span overlapping [lo, hi]. */
  def trimmedMean(lo: Double, hi: Double): Double = {
    compress()
    if (nC == 0 || hi <= lo) return Double.NaN
    val w = totalWeight
    val loW = lo * w
    val hiW = hi * w
    var cum = 0.0
    var s = 0.0
    var ws = 0.0
    var i = 0
    while (i < nC) {
      val overlap = math.min(cum + cWeights(i), hiW) - math.max(cum, loW)
      if (overlap > 0) { s += cMeans(i) * overlap; ws += overlap }
      cum += cWeights(i)
      i += 1
    }
    if (ws <= 0) Double.NaN else s / ws
  }

  def serialize(): Array[Byte] = {
    compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(TDigest.Magic)
    out.writeDouble(compression)
    out.writeDouble(min)
    out.writeDouble(max)
    out.writeInt(nC)
    var i = 0
    while (i < nC) { out.writeDouble(cMeans(i)); out.writeDouble(cWeights(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TDigest {
  /** Serialization tag so value_at_quantile can dispatch between the
    * two sketch types from the bytes alone (the reference overloads
    * the scalar on the sketch's SQL type; we have one BINARY type). */
  val Magic: Int = 0x54444731 // "TDG1"
  val DefaultCompression = 200.0

  def isTDigest(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) & 0xff) << 24 | (bytes(1) & 0xff) << 16 |
        (bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) == Magic

  def deserialize(bytes: Array[Byte]): TDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a t-digest")
    val d = new TDigest(in.readDouble())
    val mn = in.readDouble()
    val mx = in.readDouble()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val m = in.readDouble()
      val w = in.readDouble()
      d.add(m, w)
      i += 1
    }
    // add() folded centroid means into min/max; restore the true ones
    d.min = mn
    d.max = mx
    d
  }
}

/** `tdigest_agg(double[, weight]) -> binary` — mergeable centroid
  * sketch; the optional weight matches the reference's
  * `TDigestAggregationFunction` weighted overload
  * (TestTDigestFunctions.testAccuracyAtHighAndLowPercentiles). */
case class TDigestAgg(
    child: Expression,
    compression: Double = TDigest.DefaultCompression,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // empty input -> NULL
  override def children: Seq[Expression] = Seq(child) ++ weight

  override def createAggregationBuffer(): TDigest = new TDigest(compression)

  override def update(b: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) weight match {
      case None => b.add(QuantileSketchAgg.toDouble(v))
      case Some(w) =>
        val wv = w.eval(input)
        if (wv != null) {
          val d = QuantileSketchAgg.toDouble(wv)
          // reference TDigestFunctions.verifyWeight: weight < 1 would
          // silently skew centroid means — fail loud instead
          if (d < 1.0) throw new IllegalArgumentException(
            s"weight must be >= 1: $d")
          b.add(QuantileSketchAgg.toDouble(v), d)
        }
    }
    b
  }

  override def merge(b: TDigest, o: TDigest): TDigest = { b.merge(o); b }

  // aggregate-over-nothing is NULL, not an empty sketch (reference
  // TestTDigestFunctions.testEmptyTDigestInput)
  override def eval(b: TDigest): Any = if (b.isEmpty) null else b.serialize()
  override def serialize(b: TDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest =
    TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): TDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TDigestAgg =
    copy(child = c.head, weight = if (c.length > 1) Some(c(1)) else None)

  override def prettyName: String = "tdigest_agg"
}

/** `trimmed_mean(tdigest_binary, lo, hi) -> double` (reference
  * TDigestFunctions.trimmed_mean). */
case class TrimmedMean(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, lo: Any, hi: Any): Any =
    TDigest.deserialize(sketch.asInstanceOf[Array[Byte]])
      .trimmedMean(QuantileSketchAgg.toDouble(lo), QuantileSketchAgg.toDouble(hi))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TrimmedMean =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "trimmed_mean"
}

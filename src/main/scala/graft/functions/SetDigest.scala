package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Bottom-k (KMV) distinct-value digest — the engine's analogue of the
  * reference's SetDigest (`core/trino-main/.../type/setdigest/
  * SetDigest.java`: make_set_digest / merge / cardinality /
  * intersection_cardinality / jaccard_index, a MinHash+HLL hybrid).
  * Keeps the k smallest 64-bit hashes of the ingested values:
  *  - distinct estimate: exact while <k values seen; else the classic
  *    KMV estimator (k-1) / R where R is the k-th smallest hash as a
  *    fraction of the hash space;
  *  - jaccard(A, B): share of agreeing hashes among the k smallest of
  *    the union — the standard bottom-k MinHash estimator;
  *  - intersection = jaccard x union estimate.
  *
  * Determinism: the hash is splitmix64 (public mixing constants), a
  * pure function of the value — sketches are identical for identical
  * input SETS regardless of row order or partitioning, so merge is
  * order-independent and the correctness gate can pin error-bound
  * booleans (exact in the <k regime).
  *
  * Scale: the sketch is O(k) memory, built with partial aggregation
  * (map-side combine) — per-group state never exceeds k longs no
  * matter how many rows stream through, and merge is a k-way
  * union-truncate.
  */
final class KmvDigest(val k: Int) {

  // sorted by UNSIGNED hash value; TreeSet gives O(log k) insert/evict
  private val set = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  def addHash(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last) < 0 && !set.contains(h)) {
      set.pollLast(); set.add(h); ()
    }

  def add(value: Long): Unit = addHash(KmvDigest.splitmix64(value))

  /** Non-numeric values (the reference's make_set_digest is
    * type-overloaded: varchar/date/… — TestSetDigestFunctions) enter
    * the same hashed space through FNV-1a 64 over the value bytes,
    * finalized by splitmix64. */
  def addBytes(b: Array[Byte]): Unit =
    addHash(KmvDigest.splitmix64(KmvDigest.fnv64(b)))

  def merge(o: KmvDigest): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) addHash(it.next())
  }

  def size: Int = set.size

  def hashes: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Distinct-count estimate: exact below k, KMV (k-1)/R above, where
    * R is the k-th smallest hash as a fraction of the unsigned
    * 64-bit hash space. */
  def estimate(): Double =
    if (set.size < k) set.size.toDouble
    else {
      val kth = set.last.longValue()
      val unsignedAsDouble =
        if (kth >= 0) kth.toDouble else kth.toDouble + math.pow(2, 64)
      (k - 1).toDouble / (unsignedAsDouble / math.pow(2, 64))
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeInt(set.size)
    val it = set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }
}

object KmvDigest {

  val DefaultK = 2048

  /** FNV-1a 64 over raw bytes (public-domain constants). */
  def fnv64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** splitmix64 finalizer (public-domain mixing constants). */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def deserialize(bytes: Array[Byte]): KmvDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val d = new KmvDigest(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { d.addHash(in.readLong()); i += 1 }
    d
  }

  /** Bottom-k MinHash jaccard: among the k smallest hashes of A∪B,
    * the fraction present in both sketches. Exact when both sets fit
    * below k.
    *
    * The scan is truncated at min(kth(A), kth(B)) over the SATURATED
    * sketches (the standard bottom-k estimator): a saturated sketch
    * has evicted everything above its k-th smallest hash, so a union
    * hash beyond that bound cannot be classified as present/absent in
    * it — counting such hashes as "not shared" biased jaccard (and
    * intersection_cardinality) downward for asymmetric set sizes. An
    * unsaturated sketch retains its entire set and imposes no bound. */
  def jaccard(a: KmvDigest, b: KmvDigest): Double = {
    val k = math.min(a.k, b.k)
    val ha = a.hashes // ascending by unsigned value; last = k-th smallest
    val hb = b.hashes
    var bound = -1L // unsigned max: no truncation until a saturated sketch lowers it
    if (a.size >= a.k && ha.nonEmpty &&
      java.lang.Long.compareUnsigned(ha.last, bound) < 0) bound = ha.last
    if (b.size >= b.k && hb.nonEmpty &&
      java.lang.Long.compareUnsigned(hb.last, bound) < 0) bound = hb.last
    val union = new java.util.TreeSet[java.lang.Long](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    ha.foreach(union.add(_))
    hb.foreach(union.add(_))
    val sa = ha.toSet
    val sb = hb.toSet
    var inBoth = 0
    var seen = 0
    val it = union.iterator()
    var more = it.hasNext
    while (more && seen < k) {
      val h = it.next().longValue()
      if (java.lang.Long.compareUnsigned(h, bound) > 0) more = false
      else {
        if (sa.contains(h) && sb.contains(h)) inBoth += 1
        seen += 1
        more = it.hasNext
      }
    }
    if (seen == 0) 0.0 else inBoth.toDouble / seen
  }

  /** |A ∩ B| ≈ jaccard x |A ∪ B| (union estimated from the merged
    * sketch). */
  def intersectionCardinality(a: KmvDigest, b: KmvDigest): Double = {
    val u = new KmvDigest(math.min(a.k, b.k))
    u.merge(a)
    u.merge(b)
    jaccard(a, b) * u.estimate()
  }
}

/** `kmv_set_digest(longCol) -> binary` aggregate (≈ make_set_digest). */
case class KmvDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvDigest] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KmvDigest =
    new KmvDigest(KmvDigest.DefaultK)

  override def update(b: KmvDigest, input: InternalRow): KmvDigest = {
    val v = child.eval(input)
    if (v != null) v match {
      // fractional values hash via their IEEE-754 bits — longValue()
      // would truncate 1.1 and 1.9 onto the same hash and silently
      // deflate cardinality (the reference has no double overload at
      // all; bit-hashing keeps distinct doubles distinct)
      case d: java.lang.Double => b.add(java.lang.Double.doubleToLongBits(d))
      case f: java.lang.Float =>
        b.add(java.lang.Double.doubleToLongBits(f.doubleValue()))
      case n: Number => b.add(n.longValue())
      case s: org.apache.spark.unsafe.types.UTF8String => b.addBytes(s.getBytes)
      case bool: java.lang.Boolean => b.add(if (bool) 1L else 0L)
      case d: org.apache.spark.sql.types.Decimal =>
        b.addBytes(d.toJavaBigDecimal.stripTrailingZeros.toString.getBytes)
      case other => b.addBytes(String.valueOf(other).getBytes)
    }
    b
  }

  override def merge(b: KmvDigest, o: KmvDigest): KmvDigest = { b.merge(o); b }

  override def eval(b: KmvDigest): Any = b.serialize()
  override def serialize(b: KmvDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvDigest =
    KmvDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KmvDigestAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvDigestAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvDigestAgg = copy(child = c.head)

  override def prettyName: String = "kmv_set_digest"
}

/** `cardinality(setdigest) -> bigint` (reference
  * `SetDigestFunctions.java` cardinality overload — exact below k,
  * the KMV estimator above). The SQL name `cardinality` is
  * type-dispatched in CompatAliases: BINARY children land here,
  * array/map children keep Spark's native Size. */
case class KmvCardinality(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    math.rint(KmvDigest.deserialize(v.asInstanceOf[Array[Byte]]).estimate()).toLong
  override protected def withNewChildInternal(c: Expression): KmvCardinality =
    copy(child = c)
  override def prettyName: String = "cardinality"
}

/** `jaccard_index(digest, digest) -> double` (reference SetDigest
  * jaccard_index). */
case class JaccardIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvDigest.jaccard(
      KmvDigest.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvDigest.deserialize(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JaccardIndex = copy(left = l, right = r)
  override def prettyName: String = "jaccard_index"
}

/** `intersection_cardinality(digest, digest) -> long estimate`. */
case class IntersectionCardinality(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    math.rint(KmvDigest.intersectionCardinality(
      KmvDigest.deserialize(a.asInstanceOf[Array[Byte]]),
      KmvDigest.deserialize(b.asInstanceOf[Array[Byte]]))).toLong
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectionCardinality =
    copy(left = l, right = r)
  override def prettyName: String = "intersection_cardinality"
}

/** `merge_set_digest(binary) -> binary` — re-aggregation of serialized
  * KMV set digests (reference `type/setdigest/MergeSetDigestAggregation
  * .java`): the two-level pattern for distinct-count/overlap sketches —
  * digest each shard, persist the O(k) binaries, re-merge only the
  * binaries. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvDigest] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KmvDigest =
    new KmvDigest(KmvDigest.DefaultK)

  override def update(b: KmvDigest, input: InternalRow): KmvDigest = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KmvDigest.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: KmvDigest, o: KmvDigest): KmvDigest = { b.merge(o); b }

  override def eval(b: KmvDigest): Any = b.serialize()
  override def serialize(b: KmvDigest): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvDigest =
    KmvDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvMergeAgg = copy(child = c.head)

  override def prettyName: String = "merge_set_digest"
}

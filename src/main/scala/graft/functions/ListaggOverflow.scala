package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** LISTAGG `ON OVERFLOW` finishing kernel (SQL:2016 §10.9; reference
  * grammar `SqlBase.g4:348-356` listAggOverflowBehavior, semantics in
  * `operator/aggregation/listagg/ListaggAggregationFunction.java` and
  * vectors in `sql/query/TestListagg.java:204-384`).
  *
  * The dialect lowers `LISTAGG(v, sep ON OVERFLOW ...) WITHIN GROUP
  * (ORDER BY k)` onto `graft_listagg_finish(array_agg(v ORDER BY k),
  * sep, isError, filler, withCount)` — the ordered-aggregate machinery
  * produces the entries in group order, and this kernel replays the
  * reference's output walk: concatenate entries until the next entry
  * (plus separator) would push the output past the 1 MiB byte cap,
  * then either raise (`ON OVERFLOW ERROR`) or append
  * `sep + filler + "(" + omittedCount + ")"` (`TRUNCATE [filler]
  * WITH|WITHOUT COUNT`). Lengths are UTF-8 BYTES, exactly like the
  * reference's Slice lengths; truncation lands on entry boundaries.
  *
  * Scale note: `finish` itself takes a fully-buffered entry array
  * (kept for unit vectors and back-compat); production queries route
  * through [[ListaggCappedAgg]], whose per-group STATE is bounded at
  * ~cap bytes regardless of group size.
  */
object ListaggOverflow {

  /** The reference's DEFAULT_MAX_PAGE_SIZE_IN_BYTES output cap. */
  val MaxOutputBytes: Int = 1048576

  def finish(arr: Seq[String], sep: String, isError: Boolean,
      filler: String, withCount: Boolean): String = {
    if (arr == null) return null
    val vals = arr.filter(_ != null)
    if (vals.isEmpty) return null
    val sepBytes = utf8Len(sep)
    val sb = new java.lang.StringBuilder
    var outLen = 0L
    var emitted = 0
    var overflow = false
    val it = vals.iterator
    while (it.hasNext && !overflow) {
      val v = it.next()
      val entryLen = utf8Len(v)
      val spaceRequired = entryLen + (if (emitted > 0) sepBytes else 0)
      if (outLen + spaceRequired > MaxOutputBytes) overflow = true
      else {
        if (emitted > 0) { sb.append(sep); outLen += sepBytes }
        sb.append(v)
        outLen += entryLen
        emitted += 1
      }
    }
    if (overflow) {
      if (isError) throw new IllegalStateException(
        "Concatenated string has the length in bytes larger than the " +
          s"maximum output length $MaxOutputBytes")
      if (emitted > 0) sb.append(sep)
      sb.append(filler)
      if (withCount)
        sb.append('(').append(vals.length - emitted).append(')')
    }
    sb.toString
  }

  /** UTF-8 byte length without materializing the byte array. */
  private[functions] def utf8Len(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1
        else if (c < 0x800) 2
        else if (Character.isHighSurrogate(c)) { i += 1; 4 }
        else 3)
      i += 1
    }
    n
  }
}

/** Bounded per-group state for [[ListaggCappedAgg]]: a max-heap (by
  * the LISTAGG order) of candidate entries whose VALUE bytes are
  * trimmed to ~the 1 MiB output cap, plus a running count of every
  * entry ever seen (the TRUNCATE ... WITH COUNT tail needs the total,
  * never the entries themselves). */
final class ListaggCappedState(
    cmp: java.util.Comparator[ListaggCappedState.Entry]) {
  import ListaggCappedState.Entry
  /** Max-first: the head is the LAST entry in emission order — the
    * only one ever safe to drop. */
  val heap = new java.util.PriorityQueue[Entry](16, cmp.reversed())
  var keptBytes: Long = 0L
  var totalCount: Long = 0L
  var nextSeq: Long = 0L
}

object ListaggCappedState {
  /** `row` is the full (sort keys…, value) struct as an UnsafeRow
    * copy; `bytes` is the value's UTF-8 length; `seq` is the arrival
    * tie-break (keeps the sort total within a partial state). */
  final case class Entry(row: UnsafeRow, bytes: Int, seq: Long)
}

/** `graft_listagg_capped(struct(k0…, v), sep, isError, filler,
  * withCount, array(desc…), array(nullsFirst…))` — LISTAGG ON
  * OVERFLOW as ONE ordered aggregate with O(cap) state
  * (`ListaggAggregationFunction.java` semantics; the r19 lowering
  * buffered the whole group through `array_agg(… ORDER BY …)` before
  * finishing, so an adversarial group of megabyte entries held ALL of
  * them in the sort-aggregate buffer when the output can only ever
  * use ~1 MiB of entry bytes).
  *
  * State bound: entries are admitted to a max-heap keyed by the
  * LISTAGG order; the order-MAX entry is dropped as soon as the
  * entries ordered BEFORE it already overflow the output cap on their
  * own — at that point the emission walk provably stops before
  * reaching it (later inserts only push it further out), so only its
  * COUNT matters, which `totalCount` carries. Kept value bytes are
  * therefore ≤ cap + one entry; sort keys ride along (bounded by the
  * same entry count). The finishing walk replays
  * [[ListaggOverflow.finish]]'s byte-capped concatenation exactly:
  * UTF-8 byte lengths, separator accounting, entry-boundary
  * truncation, `filler(omitted)` tail, and the ON OVERFLOW ERROR
  * raise with the reference's message.
  */
case class ListaggCappedAgg(
    child: Expression,
    sep: String,
    isError: Boolean,
    filler: String,
    withCount: Boolean,
    desc: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ListaggCappedState] {

  import ListaggCappedState.Entry

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  @transient private lazy val structType =
    child.dataType.asInstanceOf[StructType]
  @transient private lazy val numKeys = structType.length - 1
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)
  @transient private lazy val keyOrdering: Ordering[InternalRow] =
    new InterpretedOrdering((0 until numKeys).map { i =>
      val f = structType(i)
      SortOrder(BoundReference(i, f.dataType, f.nullable),
        if (desc(i)) Descending else Ascending,
        if (nullsFirst(i)) NullsFirst else NullsLast, Seq.empty)
    })
  @transient private lazy val entryCmp: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] with Serializable {
      override def compare(a: Entry, b: Entry): Int = {
        val c = keyOrdering.compare(a.row, b.row)
        if (c != 0) c else java.lang.Long.compare(a.seq, b.seq)
      }
    }
  @transient private lazy val sepLen = ListaggOverflow.utf8Len(sep)

  override def createAggregationBuffer(): ListaggCappedState =
    new ListaggCappedState(entryCmp)

  override def update(b: ListaggCappedState,
      input: InternalRow): ListaggCappedState = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    // NULL values are invisible to LISTAGG (neither emitted nor
    // counted in the omitted tail) — finish() filtered them the same
    if (v != null && !v.isNullAt(numKeys)) {
      b.totalCount += 1
      // fast path: if the new entry sorts at/after the current
      // order-max AND the kept entries alone already overflow the
      // cap, it would be trimmed immediately — skip the projection +
      // copy entirely (the steady state for a large group: after the
      // buffer fills to ~cap, later-ordered arrivals only count)
      val top = b.heap.peek()
      val skip = top != null &&
        keyOrdering.compare(v, top.row) >= 0 &&
        b.keptBytes + sepLen.toLong * (b.heap.size - 1) >
          ListaggOverflow.MaxOutputBytes
      if (!skip) {
        val bytes = v.getUTF8String(numKeys).numBytes
        val u = toUnsafe(v).copy()
        b.heap.add(Entry(u, bytes, b.nextSeq))
        b.nextSeq += 1
        b.keptBytes += bytes
        trim(b)
      }
    }
    b
  }

  /** Drop the order-max entry while the kept entries BEFORE it
    * already exceed the output cap on their own (value bytes +
    * separators): the emission walk stops within them, so the max can
    * never be emitted and only its count (already in totalCount)
    * survives. Never drops the last entry — the walk may still emit a
    * prefix of any size. */
  private def trim(b: ListaggCappedState): Unit = {
    var cont = true
    while (cont && b.heap.size > 1) {
      val top = b.heap.peek()
      val restBytes = b.keptBytes - top.bytes
      val restLen = restBytes + sepLen.toLong * (b.heap.size - 2)
      if (restLen > ListaggOverflow.MaxOutputBytes) {
        b.heap.poll()
        b.keptBytes -= top.bytes
      } else cont = false
    }
  }

  override def merge(b: ListaggCappedState,
      o: ListaggCappedState): ListaggCappedState = {
    b.totalCount += o.totalCount
    if (!o.heap.isEmpty) {
      // renumber o's entries after b's, preserving o's internal order
      // (sorted feed keeps the seq tie-break meaningful)
      val arr = o.heap.toArray(new Array[Entry](o.heap.size))
      java.util.Arrays.sort(arr, entryCmp)
      var i = 0
      while (i < arr.length) {
        val e = arr(i)
        b.heap.add(Entry(e.row, e.bytes, b.nextSeq))
        b.nextSeq += 1
        b.keptBytes += e.bytes
        i += 1
      }
      trim(b)
    }
    b
  }

  override def eval(b: ListaggCappedState): Any = {
    if (b.totalCount == 0) return null
    val arr = b.heap.toArray(new Array[Entry](b.heap.size))
    java.util.Arrays.sort(arr, entryCmp)
    val sb = new java.lang.StringBuilder
    var outLen = 0L
    var emitted = 0L
    var overflow = false
    var i = 0
    while (i < arr.length && !overflow) {
      val e = arr(i)
      val space = e.bytes + (if (emitted > 0) sepLen else 0)
      if (outLen + space > ListaggOverflow.MaxOutputBytes) overflow = true
      else {
        if (emitted > 0) sb.append(sep)
        sb.append(e.row.getUTF8String(numKeys).toString)
        outLen += space
        emitted += 1
        i += 1
      }
    }
    if (emitted < b.totalCount) {
      if (isError) throw new IllegalStateException(
        "Concatenated string has the length in bytes larger than the " +
          s"maximum output length ${ListaggOverflow.MaxOutputBytes}")
      if (emitted > 0) sb.append(sep)
      sb.append(filler)
      if (withCount)
        sb.append('(').append(b.totalCount - emitted).append(')')
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(b: ListaggCappedState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.totalCount)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    var maxSeq = -1L
    while (it.hasNext) {
      val e = it.next()
      if (e.seq > maxSeq) maxSeq = e.seq
      out.writeLong(e.seq)
      out.writeInt(e.bytes)
      val rowBytes = e.row.getBytes
      out.writeInt(rowBytes.length)
      out.write(rowBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ListaggCappedState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = createAggregationBuffer()
    s.totalCount = in.readLong()
    val n = in.readInt()
    var i = 0
    var maxSeq = -1L
    while (i < n) {
      val seq = in.readLong()
      if (seq > maxSeq) maxSeq = seq
      val b = in.readInt()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      s.heap.add(Entry(row, b, seq))
      s.keptBytes += b
      i += 1
    }
    s.nextSeq = maxSeq + 1
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ListaggCappedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ListaggCappedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ListaggCappedAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_listagg_capped"
}

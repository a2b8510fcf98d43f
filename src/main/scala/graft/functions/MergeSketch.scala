package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mutable holder for a sketch of either family — the input column's
  * tag decides which on first non-null row. */
final class MergedSketch {
  var sk: AnyRef = null // QuantileDigest (double or bigint) | TDigest
}

/** `merge(binary) -> binary` — re-aggregation of serialized sketches,
  * the reference's polymorphic `merge(qdigest)` / `merge(tdigest)`
  * aggregate (`operator/aggregation/MergeQuantileDigestFunction.java`,
  * `TDigestAggregationFunction.java` merge form). This is THE
  * two-level pattern at 100 TB: level 1 sketches each
  * partition/group/day (qdigest_agg / tdigest_agg), persists the
  * O(KB) binaries, and level 2 re-aggregates ONLY the sketches —
  * never rescanning the rows — to answer global or rolled-up
  * quantiles. Dispatch is on the serialization tag (same convention
  * as value_at_quantile); mixing families in one group is an error,
  * as in the reference where the overloads are distinct types.
  */
case class MergeSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MergedSketch] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true // no non-null inputs → null
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): MergedSketch = new MergedSketch

  private def mergeInto(b: MergedSketch, other: AnyRef): Unit = (b.sk, other) match {
    case (null, _) => b.sk = other
    case (a: LogQuantileSketch, o: LogQuantileSketch) => a.merge(o)
    case (a: LongExactQuantileSketch, o: LongExactQuantileSketch) => a.mergeDigest(o)
    case (a: FloatExactQuantileSketch, o: FloatExactQuantileSketch) => a.mergeDigest(o)
    case (a: TDigest, o: TDigest) => a.merge(o)
    case (a, o) => throw new IllegalArgumentException(
      s"merge: cannot mix sketch families (${a.getClass.getSimpleName} vs " +
        s"${o.getClass.getSimpleName})")
  }

  override def update(b: MergedSketch, input: InternalRow): MergedSketch = {
    child.eval(input) match {
      case null => ()
      case bytes: Array[Byte] =>
        mergeInto(b,
          if (TDigest.isTDigest(bytes)) TDigest.deserialize(bytes)
          else QuantileDigest.deserialize(bytes))
    }
    b
  }

  override def merge(b: MergedSketch, o: MergedSketch): MergedSketch = {
    if (o.sk != null) mergeInto(b, o.sk)
    b
  }

  override def eval(b: MergedSketch): Any = b.sk match {
    case null => null
    case s: QuantileDigest => s.serialize()
    case t: TDigest => t.serialize()
  }

  override def serialize(b: MergedSketch): Array[Byte] = b.sk match {
    case null => Array.emptyByteArray
    case s: QuantileDigest => s.serialize()
    case t: TDigest => t.serialize()
  }

  override def deserialize(bytes: Array[Byte]): MergedSketch = {
    val b = new MergedSketch
    if (bytes.nonEmpty)
      b.sk =
        if (TDigest.isTDigest(bytes)) TDigest.deserialize(bytes)
        else QuantileDigest.deserialize(bytes)
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MergeSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MergeSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MergeSketchAgg = copy(child = c.head)

  override def prettyName: String = "merge"
}

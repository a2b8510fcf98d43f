package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `checksum(x) -> varbinary(8)` — order-independent table checksum
  * (reference `aggregation/ChecksumAggregationFunction.java`: xxHash64
  * per row, WRAPPING 64-bit sum, result rendered as 8 big-endian
  * bytes). Commutative addition makes the result independent of row
  * order and partitioning, so it is safe to compute distributed and
  * compare across engines of the same implementation; the hash
  * function here is Spark's xxhash64 seed 42, so values diverge from
  * the reference's (same contract, different hash constants —
  * documented, like every engine pair). Nulls contribute a fixed
  * prime so `checksum(col)` distinguishes [null] from [] (the
  * reference uses the same trick). Constant space per group. */
case class ChecksumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.lang.Long] {

  private val NullPrime = 0x9e3779b97f4a7c15L

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.lang.Long = 0L

  override def update(b: java.lang.Long, input: InternalRow): java.lang.Long = {
    val v = child.eval(input)
    val h = if (v == null) NullPrime
    else XxHash64Function.hash(v, child.dataType, 42L)
    b + h // wrapping add: order/partition-independent by commutativity
  }

  override def merge(b: java.lang.Long, o: java.lang.Long): java.lang.Long =
    b + o

  override def eval(b: java.lang.Long): Any =
    java.nio.ByteBuffer.allocate(8).putLong(b).array()

  override def serialize(b: java.lang.Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(b).array()
  override def deserialize(bytes: Array[Byte]): java.lang.Long =
    java.nio.ByteBuffer.wrap(bytes).getLong

  override def withNewMutableAggBufferOffset(n: Int): ChecksumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ChecksumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ChecksumAgg = copy(child = c.head)

  override def prettyName: String = "checksum"
}

package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

/** SpookyHash V2 (Bob Jenkins' public-domain algorithm, re-implemented
  * from the published SpookyV2 specification) — backing for the
  * reference's `spooky_hash_v2_32` / `spooky_hash_v2_64` varbinary
  * scalars (`operator/scalar/VarbinaryFunctions.java:389,399`, seed 0,
  * hash value emitted big-endian). Validated against the reference's
  * published test vectors in FunctionsSpec.
  *
  * Inputs shorter than 192 bytes take the "short" path; longer inputs
  * run the 12-lane block mix. All word reads are little-endian, as the
  * algorithm specifies.
  */
object SpookyHashV2 {

  private final val SC_CONST = 0xdeadbeefdeadbeefL
  private final val NUM_VARS = 12
  private final val BLOCK_SIZE = NUM_VARS * 8 // 96
  private final val BUF_SIZE = 2 * BLOCK_SIZE // 192

  def hash64(data: Array[Byte], seed: Long): Long = hash128(data, seed, seed)._1

  def hash32(data: Array[Byte], seed: Int): Int =
    hash128(data, seed.toLong & 0xffffffffL, seed.toLong & 0xffffffffL)._1.toInt

  def hash128(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) =
    if (data.length < BUF_SIZE) shortHash(data, seed1, seed2)
    else longHash(data, seed1, seed2)

  // ------------------------------------------------------- short path
  private def shortHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var remainder = length % 32
    var a = seed1
    var b = seed2
    var c = SC_CONST
    var d = SC_CONST
    var off = 0
    if (length > 15) {
      val nBlocks = length / 32
      var i = 0
      while (i < nBlocks) {
        c += bb.getLong(off); d += bb.getLong(off + 8)
        // ShortMix
        c = java.lang.Long.rotateLeft(c, 50); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 52); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 30); a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 41); b += c; d ^= b
        c = java.lang.Long.rotateLeft(c, 54); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 48); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 38); a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 37); b += c; d ^= b
        c = java.lang.Long.rotateLeft(c, 62); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 34); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 5);  a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 36); b += c; d ^= b
        a += bb.getLong(off + 16); b += bb.getLong(off + 24)
        off += 32
        i += 1
      }
      if (remainder >= 16) {
        c += bb.getLong(off); d += bb.getLong(off + 8)
        c = java.lang.Long.rotateLeft(c, 50); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 52); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 30); a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 41); b += c; d ^= b
        c = java.lang.Long.rotateLeft(c, 54); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 48); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 38); a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 37); b += c; d ^= b
        c = java.lang.Long.rotateLeft(c, 62); c += d; a ^= c
        d = java.lang.Long.rotateLeft(d, 34); d += a; b ^= d
        a = java.lang.Long.rotateLeft(a, 5);  a += b; c ^= a
        b = java.lang.Long.rotateLeft(b, 36); b += c; d ^= b
        off += 16
        remainder -= 16
      }
    }
    d += length.toLong << 56
    def u8(i: Int): Long = data(off + i).toLong & 0xffL
    // fall-through ladder of the reference switch (each case adds its
    // byte then continues into the next-lower case)
    if (remainder >= 15) d += u8(14) << 48
    if (remainder >= 14) d += u8(13) << 40
    if (remainder >= 13) d += u8(12) << 32
    if (remainder >= 12) {
      d += bb.getInt(off + 8).toLong & 0xffffffffL
      c += bb.getLong(off)
    } else {
      if (remainder >= 11) d += u8(10) << 16
      if (remainder >= 10) d += u8(9) << 8
      if (remainder >= 9) d += u8(8)
      if (remainder >= 8) c += bb.getLong(off)
      else {
        if (remainder >= 7) c += u8(6) << 48
        if (remainder >= 6) c += u8(5) << 40
        if (remainder >= 5) c += u8(4) << 32
        if (remainder >= 4) c += bb.getInt(off).toLong & 0xffffffffL
        else {
          if (remainder >= 3) c += u8(2) << 16
          if (remainder >= 2) c += u8(1) << 8
          if (remainder >= 1) c += u8(0)
          else { c += SC_CONST; d += SC_CONST }
        }
      }
    }
    // ShortEnd
    d ^= c; c = java.lang.Long.rotateLeft(c, 15); d += c
    a ^= d; d = java.lang.Long.rotateLeft(d, 52); a += d
    b ^= a; a = java.lang.Long.rotateLeft(a, 26); b += a
    c ^= b; b = java.lang.Long.rotateLeft(b, 51); c += b
    d ^= c; c = java.lang.Long.rotateLeft(c, 28); d += c
    a ^= d; d = java.lang.Long.rotateLeft(d, 9);  a += d
    b ^= a; a = java.lang.Long.rotateLeft(a, 47); b += a
    c ^= b; b = java.lang.Long.rotateLeft(b, 54); c += b
    d ^= c; c = java.lang.Long.rotateLeft(c, 32); d += c
    a ^= d; d = java.lang.Long.rotateLeft(d, 25); a += d
    b ^= a; a = java.lang.Long.rotateLeft(a, 63); b += a
    (a, b)
  }

  // -------------------------------------------------------- long path
  private def longHash(data: Array[Byte], seed1: Long, seed2: Long): (Long, Long) = {
    val length = data.length
    val h = new Array[Long](NUM_VARS)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = SC_CONST; h(5) = SC_CONST; h(8) = SC_CONST; h(11) = SC_CONST
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val nBlocks = length / BLOCK_SIZE
    var off = 0
    var i = 0
    while (i < nBlocks) {
      mix(bb, off, h)
      off += BLOCK_SIZE
      i += 1
    }
    // pad the remainder block; last byte carries the remainder length
    val remainder = length - off
    val buf = new Array[Byte](BLOCK_SIZE)
    System.arraycopy(data, off, buf, 0, remainder)
    buf(BLOCK_SIZE - 1) = remainder.toByte
    val tail = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    // End (V2): absorb the final block, then three EndPartial rounds
    var j = 0
    while (j < NUM_VARS) { h(j) += tail.getLong(j * 8); j += 1 }
    endPartial(h); endPartial(h); endPartial(h)
    (h(0), h(1))
  }

  private def mix(bb: ByteBuffer, off: Int, s: Array[Long]): Unit = {
    def rot(i: Int, r: Int): Unit = s(i) = java.lang.Long.rotateLeft(s(i), r)
    s(0) += bb.getLong(off);       s(2) ^= s(10); s(11) ^= s(0); rot(0, 11);  s(11) += s(1)
    s(1) += bb.getLong(off + 8);   s(3) ^= s(11); s(0) ^= s(1);  rot(1, 32);  s(0) += s(2)
    s(2) += bb.getLong(off + 16);  s(4) ^= s(0);  s(1) ^= s(2);  rot(2, 43);  s(1) += s(3)
    s(3) += bb.getLong(off + 24);  s(5) ^= s(1);  s(2) ^= s(3);  rot(3, 31);  s(2) += s(4)
    s(4) += bb.getLong(off + 32);  s(6) ^= s(2);  s(3) ^= s(4);  rot(4, 17);  s(3) += s(5)
    s(5) += bb.getLong(off + 40);  s(7) ^= s(3);  s(4) ^= s(5);  rot(5, 28);  s(4) += s(6)
    s(6) += bb.getLong(off + 48);  s(8) ^= s(4);  s(5) ^= s(6);  rot(6, 39);  s(5) += s(7)
    s(7) += bb.getLong(off + 56);  s(9) ^= s(5);  s(6) ^= s(7);  rot(7, 57);  s(6) += s(8)
    s(8) += bb.getLong(off + 64);  s(10) ^= s(6); s(7) ^= s(8);  rot(8, 55);  s(7) += s(9)
    s(9) += bb.getLong(off + 72);  s(11) ^= s(7); s(8) ^= s(9);  rot(9, 54);  s(8) += s(10)
    s(10) += bb.getLong(off + 80); s(0) ^= s(8);  s(9) ^= s(10); rot(10, 22); s(9) += s(11)
    s(11) += bb.getLong(off + 88); s(1) ^= s(9);  s(10) ^= s(11); rot(11, 46); s(10) += s(0)
  }

  private def endPartial(h: Array[Long]): Unit = {
    def rot(i: Int, r: Int): Unit = h(i) = java.lang.Long.rotateLeft(h(i), r)
    h(11) += h(1); h(2) ^= h(11); rot(1, 44)
    h(0) += h(2);  h(3) ^= h(0);  rot(2, 15)
    h(1) += h(3);  h(4) ^= h(1);  rot(3, 34)
    h(2) += h(4);  h(5) ^= h(2);  rot(4, 21)
    h(3) += h(5);  h(6) ^= h(3);  rot(5, 38)
    h(4) += h(6);  h(7) ^= h(4);  rot(6, 33)
    h(5) += h(7);  h(8) ^= h(5);  rot(7, 10)
    h(6) += h(8);  h(9) ^= h(6);  rot(8, 13)
    h(7) += h(9);  h(10) ^= h(7); rot(9, 38)
    h(8) += h(10); h(11) ^= h(8); rot(10, 53)
    h(9) += h(11); h(0) ^= h(9);  rot(11, 42)
    h(10) += h(0); h(1) ^= h(10); rot(0, 54)
  }
}

/** `spooky_hash_v2_32(varbinary) -> varbinary(4)` — the hash value's
  * bytes big-endian, matching the reference's net emission
  * (`Integer.reverseBytes` written into a little-endian slice). */
case class SpookyHashV232(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any = {
    val v = SpookyHashV2.hash32(input.asInstanceOf[Array[Byte]], 0)
    ByteBuffer.allocate(4).putInt(v).array()
  }

  override protected def withNewChildInternal(c: Expression): SpookyHashV232 =
    copy(child = c)
  override def prettyName: String = "spooky_hash_v2_32"
}

/** `spooky_hash_v2_64(varbinary) -> varbinary(8)` — big-endian bytes of
  * the 64-bit hash, matching the reference's net emission
  * (`Long.reverseBytes` written into a little-endian slice). */
case class SpookyHashV264(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(input: Any): Any = {
    val v = SpookyHashV2.hash64(input.asInstanceOf[Array[Byte]], 0L)
    ByteBuffer.allocate(8).putLong(v).array()
  }

  override protected def withNewChildInternal(c: Expression): SpookyHashV264 =
    copy(child = c)
  override def prettyName: String = "spooky_hash_v2_64"
}

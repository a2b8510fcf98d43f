package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `media_probe(binary) -> struct<format, width, height>`: container
  * header probe for image payloads — the real (non-stubbed) part of
  * multimodal decode that needs no codec library, only the published
  * container layouts:
  *
  *   - PNG (ISO 15948): 8-byte signature, IHDR chunk → width/height as
  *     big-endian u32 at offsets 16/20.
  *   - JPEG (ITU T.81): marker-segment scan from SOI past APPn/DQT/...
  *     to the first SOFn (C0–CF minus C4/C8/CC), whose payload carries
  *     height/width as big-endian u16 at +5/+7. Fill bytes (repeated
  *     FF) are tolerated per the spec.
  *   - GIF (87a/89a): logical-screen width/height as little-endian u16
  *     at offsets 6/8.
  *
  * Anything else (or any truncated/malformed prefix) probes as
  * ('unknown', null, null) — never an exception, so a corrupt asset in
  * a 100 TB corpus cannot kill a task. Capability match: reference
  * connector-side binary type handling (`plugin/trino-hive/` binary
  * mapping); the probe is a scan-side narrow projection — payload
  * bytes never shuffle.
  */
case class MediaProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaProbe.schema

  override protected def nullSafeEval(input: Any): Any =
    MediaProbe.probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaProbe.probe($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaProbe =
    copy(child = newChild)

  override def prettyName: String = "media_probe"
}

object MediaProbe {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  private val Unknown = "unknown"

  /** Static kernel shared by interpreted eval and generated code. */
  def probe(b: Array[Byte]): InternalRow = {
    if (b.length >= 24 && startsWith(b, PngSig) &&
        u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      return jpeg(b)
    if (b.length >= 10 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    row(Unknown, null, null)
  }

  private def startsWith(b: Array[Byte], prefix: Array[Byte]): Boolean = {
    var i = 0
    while (i < prefix.length) { if (b(i) != prefix(i)) return false; i += 1 }
    true
  }

  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  private def jpeg(b: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 3 < b.length) {
      if (u8(b, pos) != 0xff) return row(Unknown, null, null)
      // tolerate fill bytes: FF FF ... FF <marker>
      while (pos + 1 < b.length && u8(b, pos + 1) == 0xff) pos += 1
      if (pos + 3 >= b.length) return row(Unknown, null, null)
      val marker = u8(b, pos + 1)
      if (isSof(marker)) {
        if (pos + 8 < b.length)
          return row("jpeg", be16(b, pos + 7), be16(b, pos + 5))
        return row(Unknown, null, null)
      }
      if (marker == 0xd9 || marker == 0xda) // EOI / SOS before any SOF
        return row(Unknown, null, null)
      if (marker >= 0xd0 && marker <= 0xd7) pos += 2 // standalone RSTn
      else {
        val segLen = be16(b, pos + 2)
        if (segLen < 2) return row(Unknown, null, null)
        pos += 2 + segLen
      }
    }
    row(Unknown, null, null)
  }
}

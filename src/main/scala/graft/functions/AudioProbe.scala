package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `audio_probe(binary) -> struct<format, channels, sample_rate, bits,
  * duration_ms>`: container header probe for audio payloads — the
  * audio sibling of [[MediaProbe]], parsing only the published
  * container layouts (no codec library):
  *
  *   - WAV (RIFF, Microsoft/IBM WAVE spec): 'RIFF' + size + 'WAVE',
  *     then a chunk walk (chunks are ['id'][le32 size][payload],
  *     odd sizes pad one byte) to the 'fmt ' chunk → channels (le16 at
  *     +2), sample rate (le32 at +4), byte rate (le32 at +8), bits
  *     (le16 at +14), and the 'data' chunk → payload length.
  *     duration_ms = data_len * 1000 / byte_rate (truncating integer
  *     division).
  *   - FLAC (xiph.org spec): 'fLaC' + STREAMINFO metadata block —
  *     sample rate (20 bits at byte 18), channels-1 (3 bits), bits-1
  *     (5 bits), 36-bit total sample count; duration_ms =
  *     total_samples * 1000 / rate.
  *   - MP3: an ID3v2 tag ('ID3') or an MPEG frame sync (0xFFEx) probes
  *     the format only (frame headers carry no total duration without
  *     a full scan — nulls, like a real probe-not-decode pass).
  *
  * Anything else (or any truncated/malformed prefix) probes as
  * ('unknown', nulls) — never an exception, so a corrupt asset in a
  * 100 TB corpus cannot kill a task. Scan-side narrow projection:
  * payload bytes never shuffle, only the 5-field struct flows.
  */
case class AudioProbe(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioProbe.schema

  override protected def nullSafeEval(input: Any): Any =
    AudioProbe.probe(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioProbe.probe($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioProbe =
    copy(child = newChild)

  override def prettyName: String = "audio_probe"
}

object AudioProbe {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + t.length <= b.length && t.indices.forall(k => u8(b, i + k) == t.charAt(k))

  private def row(fmt: String, ch: Any, rate: Any, bits: Any, durMs: Any): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), ch, rate, bits, durMs))

  private val Unknown = row("unknown", null, null, null, null)

  /** Static kernel shared by interpreted eval and generated code. */
  def probe(b: Array[Byte]): InternalRow = {
    if (b.length >= 12 && tag(b, 0, "RIFF") && tag(b, 8, "WAVE")) return wav(b)
    if (b.length >= 42 && tag(b, 0, "fLaC")) return flac(b)
    if (b.length >= 3 && tag(b, 0, "ID3")) return row("mp3", null, null, null, null)
    if (b.length >= 2 && u8(b, 0) == 0xff && (u8(b, 1) & 0xe0) == 0xe0)
      return row("mp3", null, null, null, null)
    Unknown
  }

  private def wav(b: Array[Byte]): InternalRow = {
    var pos = 12
    var channels = -1
    var rate = -1L
    var byteRate = -1L
    var bits = -1
    var dataLen = -1L
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      val body = pos + 8
      if (tag(b, pos, "fmt ") && size >= 16 && body + 16 <= b.length) {
        channels = le16(b, body + 2)
        rate = le32(b, body + 4)
        byteRate = le32(b, body + 8)
        bits = le16(b, body + 14)
      } else if (tag(b, pos, "data")) {
        dataLen = size
      }
      // advance in LONG space: a declared size near Int.MaxValue must
      // not wrap pos negative (never-throw contract on corrupt bytes)
      val next = body.toLong + size + (size & 1L) // odd chunk sizes pad 1
      if (size < 0 || next > b.length) {
        // a truncated/overstated final chunk is fine only if we already
        // saw the data chunk; otherwise the container is unreadable
        pos = b.length
      } else pos = next.toInt
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) return Unknown
    val durMs = if (byteRate > 0) Long.box(dataLen * 1000L / byteRate) else null
    row("wav", channels, rate.toInt, bits, durMs)
  }

  private def flac(b: Array[Byte]): InternalRow = {
    // metadata block header at 4: type (low 7 bits) 0 = STREAMINFO,
    // 24-bit length; STREAMINFO body starts at 8
    if ((u8(b, 4) & 0x7f) != 0) return Unknown
    val rate = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val channels = ((u8(b, 20) >> 1) & 0x7) + 1
    val bits = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val totalSamples = ((u8(b, 21) & 0xf).toLong << 32) | be32(b, 22)
    if (rate <= 0) return Unknown
    row("flac", channels, rate, bits, Long.box(totalSamples * 1000L / rate))
  }
}

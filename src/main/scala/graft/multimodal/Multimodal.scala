package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft

/** An opaque media asset: binary payload + typed metadata (the
  * multimodal-column model: image/audio/video travel as `binary` with
  * schema'd metadata beside them). */
case class Asset(asset_id: Long, media_type: String, byte_len: Long, content: Array[Byte])

/** One fixed-size "frame" sampled from an asset's payload. */
case class Frame(asset_id: Long, frame_no: Long, frame: Array[Byte])

/** Per-asset feature vector produced by the (stubbed) decoder. */
case class AssetFeatures(asset_id: Long, dim: Int, features: Array[Float])

/** Multimodal-column operators (north-star capability): treat media as
  * opaque `binary` columns with typed metadata; decode / resize /
  * frame-sample / feature-extract run as partition-local batch
  * functions over the binary payloads.
  *
  * Container-level decode (format/width/height from PNG/JPEG/GIF
  * headers) is REAL — the native `media_probe` expression
  * (functions/MediaProbe.scala), hash-gated by mm2. Only the deep
  * FEATURE-EXTRACTION step is a stub: this container has no
  * image/audio codec libraries, so `stubDecode` derives a
  * deterministic fake feature vector from the bytes (clearly marked
  * below). Everything around it — the binary schema, the per-partition
  * batch execution (decoder state initialized once per partition,
  * exactly how a real codec amortizes model/codec load), the
  * frame-window explosion, and the deterministic byte math — is real,
  * tested Spark plumbing that a real decoder drops into.
  *
  * Scale notes (100 TB of media): payloads never shuffle — every
  * operator below is a narrow map/flatMap over the scan; only the
  * k-float feature rows or 64-byte frames (orders of magnitude
  * smaller) flow downstream. Frame sampling bounds the per-row output
  * (`maxFrames`), so a pathological 10 GB asset cannot blow up a task.
  */
object Multimodal {

  val FrameBytes = 64
  val FeatureDim = 16

  /** Documents rendered as binary assets (UTF-8 payloads stand in for
    * media bytes; byte_len is real payload length). */
  def assets(s: SparkSession, dir: String): Dataset[Asset] = {
    import s.implicits._
    Graft.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        Asset(r.getLong(0), "text/plain", bytes.length.toLong, bytes)
      }
  }

  /** STUB decoder: a real implementation would hand `content` to an
    * image/audio codec and pool activations; here we fold bytes into
    * a deterministic pseudo-feature vector so the distributed plumbing
    * is exercised end-to-end. */
  private def stubDecode(content: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < content.length) {
      acc(i % FeatureDim) += ((content(i) & 0xff) - 128) / 128.0f
      i += 1
    }
    acc
  }

  /** Feature extraction as a partition-local batch op: decoder "state"
    * (a real codec handle) is created once per partition, then streams
    * the partition's assets through it. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real codec: initialize decoder/model HERE, once per partition
      it.map(a => AssetFeatures(a.asset_id, FeatureDim, stubDecode(a.content)))
    }
  }

  /** Frame sampling: split the payload into FrameBytes windows and
    * keep every `stride`-th one, capped at `maxFrames` (video
    * frame-sampling shape: bounded output per asset). */
  def sampleFrames(assets: Dataset[Asset], stride: Int, maxFrames: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val nWindows = (a.content.length + FrameBytes - 1) / FrameBytes
      (0 until nWindows by stride).take(maxFrames).map { w =>
        val from = w * FrameBytes
        val until = math.min(from + FrameBytes, a.content.length)
        Frame(a.asset_id, w.toLong, java.util.Arrays.copyOfRange(a.content, from, until))
      }
    }
  }

  /** "Resize": truncate/pad the payload to a fixed byte budget (the
    * shape of a thumbnailing pass — output size is bounded and
    * constant regardless of input size). */
  def resizeStub(assets: Dataset[Asset], budget: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val out = java.util.Arrays.copyOf(a.content, math.min(a.content.length, budget))
      Asset(a.asset_id, a.media_type, out.length.toLong, out)
    }
  }

  // ---------------------------------------------------------- queries
  /** Frame-sampling census with a real oracle: payloads are UTF-8 of
    * `text`, so frame count, first-frame hash, and byte length are all
    * recomputable relationally (md5 of the first 64-char substring). */
  def mm1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fr = sampleFrames(assets(s, dir), stride = 1, maxFrames = 1000)
    fr.groupByKey(_.asset_id)
      .mapGroups { (id, frames) =>
        val fs = frames.toSeq.sortBy(_.frame_no)
        val first = fs.head.frame
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(first).map(b => f"$b%02x").mkString
        (id, fs.length.toLong, fs.map(_.frame.length.toLong).sum, hex)
      }
      .toDF("asset_id", "n_frames", "total_bytes", "first_frame_md5")
  }

  val mm1Sql: String =
    """SELECT doc_id AS asset_id,
      |  CAST(ceil(n_chars / 64.0) AS BIGINT) AS n_frames,
      |  n_chars AS total_bytes,
      |  md5(substring(text, 1, 64)) AS first_frame_md5
      |FROM documents""".stripMargin

  /** Real (non-stubbed) image decode at the container level: each
    * document is rendered as a PNG, JPEG, or GIF payload (cycling on
    * doc_id % 3) whose header carries doc_id-derived dimensions, built
    * byte-for-byte with Catalyst binary concat — and the native
    * `media_probe` expression (functions/MediaProbe.scala) parses the
    * format and dimensions BACK out of the raw bytes (big-endian IHDR
    * for PNG, a JPEG marker-segment scan to SOF0, little-endian
    * logical-screen for GIF). The oracle recomputes the expected
    * dimensions relationally, so a parser that misreads any offset or
    * endianness hash-fails. Payload bytes never leave the scan
    * projection — only the 3-field probe struct flows downstream. */
  def mm2(s: SparkSession, dir: String): DataFrame = {
    val d = Graft.load(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 800 + 16).as("w"),
        (col("doc_id") * 7 % 600 + 12).as("h"))
    def be32(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 8, "0"))
    def be16(c: org.apache.spark.sql.Column) = unhex(lpad(hex(c), 4, "0"))
    def le16(c: org.apache.spark.sql.Column) =
      unhex(concat(lpad(hex(c.bitwiseAND(255)), 2, "0"),
        lpad(hex(shiftright(c.cast("int"), 8)), 2, "0")))
    val png = concat(
      unhex(lit("89504E470D0A1A0A" + "0000000D" + "49484452")),
      be32(col("w")), be32(col("h")),
      unhex(lit("0806000000" + "1F15C489")))
    val jpeg = concat(
      unhex(lit("FFD8" + "FFE00010" + "4A46494600010100000100010000" +
        "FFC00011" + "08")),
      be16(col("h")), be16(col("w")),
      unhex(lit("03012200021101031101")))
    val gif = concat(
      unhex(lit("474946383961")), le16(col("w")), le16(col("h")),
      unhex(lit("F7000000")))
    val content = when(col("doc_id") % 3 === 0, png)
      .when(col("doc_id") % 3 === 1, jpeg)
      .otherwise(gif)
    d.select(col("doc_id").as("asset_id"),
        call_function("media_probe", content).as("m"))
      .select(col("asset_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"))
  }

  val mm2Sql: String =
    """SELECT doc_id AS asset_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
      |  CAST(doc_id % 800 + 16 AS INT) AS width,
      |  CAST(doc_id * 7 % 600 + 12 AS INT) AS height
      |FROM documents""".stripMargin

  /** Real container-level AUDIO decode: each document renders as a
    * WAV payload (RIFF chunk layout, all-little-endian fields) whose
    * fmt/data chunks carry doc_id-derived channels / sample rate /
    * bit depth / sample count, built byte-for-byte with Catalyst
    * binary concat — and the native `audio_probe` expression
    * (functions/AudioProbe.scala) walks the chunks and parses them
    * BACK out of the raw bytes, deriving duration from
    * data_len/byte_rate in truncating integer division. The oracle
    * recomputes every field relationally, so a probe that misreads a
    * chunk offset, field width, or endianness hash-fails. Payload
    * bytes never leave the scan projection. */
  def mm3(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val d = Graft.load(s, dir, "documents")
      .select(col("doc_id"),
        (col("doc_id") % 2 + 1).cast("int").as("ch"),
        when(col("doc_id") % 3 === 0, 8000)
          .when(col("doc_id") % 3 === 1, 16000)
          .otherwise(44100).cast("int").as("rate"),
        ((col("doc_id") % 2 + 1) * 8).cast("int").as("bits"),
        (col("doc_id") % 1000 + 1).cast("int").as("ns"))
      .withColumn("ba", (col("ch") * col("bits") / 8).cast("int"))
      .withColumn("datalen", (col("ns") * col("ba")).cast("int"))
      .withColumn("byterate", (col("rate") * col("ba")).cast("int"))
    def leByte(c: Column, sh: Int) =
      lpad(hex(shiftright(c.cast("int"), sh).bitwiseAND(255)), 2, "0")
    def le16(c: Column) = unhex(concat(leByte(c, 0), leByte(c, 8)))
    def le32(c: Column) =
      unhex(concat(leByte(c, 0), leByte(c, 8), leByte(c, 16), leByte(c, 24)))
    val content = concat(
      unhex(lit("52494646")), le32(col("datalen") + 36), // 'RIFF' + size
      unhex(lit("57415645")), // 'WAVE'
      unhex(lit("666D7420")), le32(lit(16)), // 'fmt ' + 16
      le16(lit(1)), le16(col("ch")), le32(col("rate")), // PCM, channels, rate
      le32(col("byterate")), le16(col("ba")), le16(col("bits")),
      unhex(lit("64617461")), le32(col("datalen"))) // 'data' + length
    d.select(col("doc_id").as("asset_id"),
        call_function("audio_probe", content).as("a"))
      .select(col("asset_id"),
        col("a.format").as("format"),
        col("a.channels").as("channels"),
        col("a.sample_rate").as("sample_rate"),
        col("a.bits").as("bits"),
        col("a.duration_ms").as("duration_ms"))
  }

  val mm3Sql: String =
    """SELECT doc_id AS asset_id, 'wav' AS format,
      |  CAST(doc_id % 2 + 1 AS INT) AS channels,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |       ELSE 44100 END AS INT) AS sample_rate,
      |  CAST((doc_id % 2 + 1) * 8 AS INT) AS bits,
      |  CAST((doc_id % 1000 + 1) * 1000 //
      |    (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |     ELSE 44100 END) AS BIGINT) AS duration_ms
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_frame_sample" -> mm1 _,
    "mm2_media_probe" -> mm2 _,
    "mm3_audio_probe" -> mm3 _)

  val oracle: Map[String, String] = Map(
    "mm1_frame_sample" -> mm1Sql,
    "mm2_media_probe" -> mm2Sql,
    "mm3_audio_probe" -> mm3Sql)
}

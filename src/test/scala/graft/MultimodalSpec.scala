package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal plumbing tests: binary schema, frame windows, bounded
  * sampling, and decode-stub determinism. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-mm-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("assets carry binary payloads with correct lengths") {
    val a = Multimodal.assets(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(x => x.content.length.toLong == x.byte_len))
    assert(a.forall(_.media_type == "text/plain"))
  }

  test("frame sampling windows cover the payload exactly once at stride 1") {
    val assets = Multimodal.assets(spark, sfDir)
    val frames = Multimodal.sampleFrames(assets, stride = 1, maxFrames = 10000)
      .collect().groupBy(_.asset_id)
    val byLen = assets.collect().map(a => a.asset_id -> a.content).toMap
    frames.foreach { case (id, fs) =>
      val reassembled = fs.sortBy(_.frame_no).flatMap(_.frame)
      assert(reassembled.sameElements(byLen(id)), s"asset $id")
    }
  }

  test("stride and maxFrames bound the output") {
    val assets = Multimodal.assets(spark, sfDir)
    val fs = Multimodal.sampleFrames(assets, stride = 2, maxFrames = 3).collect()
    assert(fs.groupBy(_.asset_id).values.forall(_.length <= 3))
    assert(fs.forall(_.frame_no % 2 == 0))
  }

  test("resize truncates to the byte budget") {
    val out = Multimodal.resizeStub(Multimodal.assets(spark, sfDir), 100).collect()
    assert(out.forall(_.byte_len <= 100))
  }

  test("decode stub is deterministic and produces finite fixed-dim features") {
    val f1 = Multimodal.extractFeatures(Multimodal.assets(spark, sfDir))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(Multimodal.assets(spark, sfDir))
      .collect().sortBy(_.asset_id)
    assert(f1.length == f2.length && f1.nonEmpty)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.sameElements(b.features))
      assert(a.features.length == Multimodal.FeatureDim)
      assert(a.features.forall(v => !v.isNaN && !v.isInfinite))
    }
  }

  // ------------------------------------------------------ media_probe
  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def probe(hex: String): (String, Option[Int], Option[Int]) = {
    val r = graft.functions.MediaProbe.probe(hexBytes(hex))
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)))
  }

  test("media_probe parses PNG IHDR dimensions (big-endian u32)") {
    // a genuine minimal 1x1 PNG header (signature + IHDR)
    assert(probe("89504E470D0A1A0A 0000000D 49484452 00000001 00000001 0806000000 1F15C489")
      == (("png", Some(1), Some(1))))
    assert(probe("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 0802000000 00000000")
      == (("png", Some(640), Some(480))))
    // truncated signature-only prefix must not throw
    assert(probe("89504E470D0A1A0A")._1 == "unknown")
  }

  test("media_probe scans JPEG segments to the first SOFn") {
    // SOI + APP0 + DQT + DHT (C4: NOT a SOF) + SOF2 (progressive), h=2 w=3
    assert(probe("FFD8 FFE00010 4A46494600010100000100010000" +
      " FFDB0005 000102 FFC40005 000000 FFC20011 08 0002 0003 03012200021101031101")
      == (("jpeg", Some(3), Some(2))))
    // fill bytes before the marker are legal (T.81 B.1.1.2)
    assert(probe("FFD8 FF FFC00011 08 0004 0009") == (("jpeg", Some(9), Some(4))))
    // SOS before any SOF → no dimensions
    assert(probe("FFD8 FFDA0002")._1 == "unknown")
  }

  test("media_probe parses GIF logical screen (little-endian u16)") {
    assert(probe("474946383961 0301 0200 F7000000") == (("gif", Some(259), Some(2))))
    assert(probe("474946383761 4000 3000 00000000") == (("gif", Some(64), Some(48))))
  }

  test("media_probe yields unknown on non-media bytes, never throws") {
    assert(probe("68656C6C6F20776F726C6420202020")._1 == "unknown")
    assert(probe("")._1 == "unknown")
    assert(probe("FF")._1 == "unknown")
  }

  test("media_probe is registered for SQL over binary columns") {
    val r = spark.sql(
      "SELECT media_probe(unhex('89504E470D0A1A0A0000000D494844520000000100000001080600" +
        "00001F15C489')) AS m")
      .selectExpr("m.format", "m.width", "m.height").head()
    assert((r.getString(0), r.getInt(1), r.getInt(2)) == (("png", 1, 1)))
  }

  private def probeA(hex: String): (String, Option[Int], Option[Int], Option[Int], Option[Long]) = {
    val r = graft.functions.AudioProbe.probe(hexBytes(hex))
    (r.getUTF8String(0).toString,
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      if (r.isNullAt(3)) None else Some(r.getInt(3)),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("audio_probe parses WAV fmt/data chunks (all little-endian)") {
    // 1 ch, 8000 Hz, 8-bit, 16 data bytes -> 2 ms
    val wav = "52494646 34000000 57415645 " +
      "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800 " +
      "64617461 10000000 " + "00" * 16
    assert(probeA(wav) == (("wav", Some(1), Some(8000), Some(8), Some(2L))))
    // chunk walk skips foreign chunks and honors odd-size padding
    val padded = "52494646 40000000 57415645 " +
      "4C495354 03000000 AABBCC 00 " + // 'LIST' len 3 + 1 pad byte
      "666D7420 10000000 0100 0200 80BB0000 00EE0200 0400 1000 " + // 2ch 48k 16-bit
      "64617461 00770100" // 96000 bytes claimed (header-only payload)
    assert(probeA(padded) == (("wav", Some(2), Some(48000), Some(16), Some(500L))))
    // truncated / malformed never throws
    assert(probeA("52494646 34000000 57415645")._1 == "unknown")
    assert(probeA("524946")._1 == "unknown")
    // declared chunk size near Int.MaxValue must not wrap the cursor
    // negative (cursor advances in Long space): 0x7FFFFFEF passes the
    // old `size > Int.MaxValue - 16` guard yet overflowed body+size
    assert(probeA("52494646 34000000 57415645 4C495354 EFFFFF7F")._1 == "unknown")
    assert(probeA(
      "52494646 34000000 57415645 " +
        "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800 " +
        "64617461 ECFFFF7F")._1 == "wav") // overstated data size: stop, keep fmt
  }

  test("audio_probe parses FLAC STREAMINFO bit fields") {
    // 44100 Hz, 2 ch, 16-bit, 44100 samples -> 1000 ms
    val flac = "664C6143 80 000022 " +
      "1000 1000 000000 000000 " + // block/frame size bounds
      "0AC442F0 0000AC44 " +        // rate/ch/bits + 36-bit total samples
      "00" * 16                      // md5
    assert(probeA(flac) == (("flac", Some(2), Some(44100), Some(16), Some(1000L))))
  }

  test("audio_probe detects MP3 by ID3 tag or frame sync; unknown never throws") {
    assert(probeA("494433040000")._1 == "mp3")
    assert(probeA("FFFB9000")._1 == "mp3")
    assert(probeA("68656C6C6F")._1 == "unknown")
    assert(probeA("")._1 == "unknown")
  }

  test("audio_probe is registered for SQL over binary columns") {
    val r = spark.sql(
      "SELECT audio_probe(unhex('524946463400000057415645666D7420100000000100010040" +
        "1F0000401F00000100080064617461100000000000000000000000000000000000000000" +
        "0000000000')) AS a")
      .selectExpr("a.format", "a.channels", "a.sample_rate", "a.bits", "a.duration_ms")
      .head()
    assert((r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)) ==
      (("wav", 1, 8000, 8, 2L)))
  }
}

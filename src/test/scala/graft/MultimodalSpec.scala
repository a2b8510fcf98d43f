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
}

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
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Materialized-view lifecycle: create → fresh read (storage table) →
  * source change → stale detection → grace-period read vs
  * defining-query fallback → REFRESH re-pins freshness. Mirrors the
  * reference's getMaterializedViewFreshness + GRACE PERIOD contract. */
class MaterializedViewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-mv-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = Files.createTempDirectory("graft_mv").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("MV serves storage when fresh, detects staleness, refreshes") {
    import graft.operators.MaterializedView
    val spk = spark
    import spk.implicits._
    val srcDir = s"$tmp/src"
    def writeSource(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("k", "v").write.mode("overwrite")
        .parquet(s"$srcDir/sales.parquet")
    writeSource(Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)))

    val storage = s"$tmp/mv_sales"
    val sources = Seq(srcDir -> "sales")
    def defining(): DataFrame = spark.read.parquet(s"$srcDir/sales.parquet")
      .groupBy("k").agg(sum("v").as("total"))

    // create + fresh read: served from storage
    val first = MaterializedView.read(spark, storage, () => defining(), sources)
    assert(first.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 30.0), (2L, 5.0)))
    assert(MaterializedView.freshness(storage, sources, 0L).fresh)

    // change the source → stale; storage still holds the OLD result
    Thread.sleep(1100) // mtime granularity can be 1 s
    writeSource(Seq((1L, 10.0), (2L, 5.0), (3L, 7.0)))
    val f = MaterializedView.freshness(storage, sources, Long.MaxValue)
    assert(!f.fresh && f.withinGrace)

    // grace period unbounded → bounded-stale read serves storage (old)
    val graceRead = MaterializedView.read(
      spark, storage, () => defining(), sources, gracePeriodMs = Long.MaxValue)
    assert(graceRead.collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    // grace 0 → stale read falls back to the defining query (new data)
    val strictRead = MaterializedView.read(
      spark, storage, () => defining(), sources, gracePeriodMs = 0L)
    assert(strictRead.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // REFRESH re-materializes + re-pins freshness; storage now new
    MaterializedView.refresh(spark, storage, () => defining(), sources)
    assert(MaterializedView.freshness(storage, sources, 0L).fresh)
    val after = spark.read.parquet(storage)
    assert(after.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 10.0), (2L, 5.0), (3L, 7.0)))

    // readRefreshing: a stale-past-grace MV is refreshed ONCE, then
    // served from storage — the maintenance-schedule composition
    Thread.sleep(1100)
    writeSource(Seq((4L, 1.0)))
    assert(!MaterializedView.freshness(storage, sources, 0L).fresh)
    val healed = MaterializedView.readRefreshing(
      spark, storage, () => defining(), sources, gracePeriodMs = 0L)
    assert(healed.collect().map(_.getLong(0)).toSet == Set(4L))
    // meta was re-pinned: the next read is fresh, no recompute path
    assert(MaterializedView.freshness(storage, sources, 0L).fresh)
  }
}

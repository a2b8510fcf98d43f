package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + catalog bootstrap for the graft engine.
  *
  * Mirrors the reference engine's session/catalog surface (witdb/Trino:
  * coordinator session + connector catalogs, see reference
  * `core/trino-main/.../SystemSessionProperties.java`) re-expressed as a
  * configured [[SparkSession]] plus temp-view registration of the parquet
  * test tables. All heavy lifting (CBO, AQE, DPP, runtime bloom filters —
  * the reference's `DetermineJoinDistributionType` / dynamic-filtering
  * machinery) is delegated to Catalyst by turning the right flags on.
  */
object Graft {

  /** All tables the driver generates (TESTDATA.md + FIXTURES.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Build a session tuned for local[N] that still plans like a cluster:
    * AQE re-partitions at runtime, CBO + broadcast thresholds pick join
    * strategies, bloom-filter runtime pushdown stands in for the
    * reference's dynamic filtering.
    */
  def session(appName: String = "graft",
              cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    b.getOrCreate()
  }

  /** Read one test table. Filters/projections on the result are pushed
    * into the parquet scan by Catalyst (verify via `PushedFilters` in
    * `.explain("formatted")`).
    *
    * `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 rejects
    * by default ([PARQUET_TYPE_ILLEGAL]); `nanosAsLong` maps it to a
    * bigint of epoch-nanos, and [[events]] derives a micros timestamp.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The events table with `ts_ns` (exact epoch-nanos, ordering key) and
    * `ts` (micros-precision timestamp for date/window functions).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }

  /** Register every test table as a temp view (SQL-surface parity with
    * the reference's catalog.schema.table namespace, flattened).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}

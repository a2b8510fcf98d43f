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
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every test table as a temp view (SQL-surface parity with
    * the reference's catalog.schema.table namespace, flattened).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}

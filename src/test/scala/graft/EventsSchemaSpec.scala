package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Guard for the r12 events-schema drift: the driver has shipped
  * `events.parquet` both as TIMESTAMP(NANOS) (read as epoch-nanos BIGINT
  * under `nanosAsLong`) and as timestamp[us]. `Graft.events` must
  * normalize BOTH physical layouts to the same logical schema — exact
  * `ts_ns` bigint + micros `ts` — like the reference resolves table
  * metadata per-table at analysis time instead of hard-coding a physical
  * type (reference `core/trino-spi/.../connector/ConnectorMetadata.java`).
  */
class EventsSchemaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-events-schema", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** One logical fixture, written in a chosen physical layout. Micros are
    * deliberately non-round so truncation bugs would show. */
  private def writeFixture(dir: String, layout: String): Unit = {
    val spk = spark
    import spk.implicits._
    val rows = Seq(
      (1L, 1700000000123456L, 10L, "click", 1.5, """{"a":1}"""),
      (2L, 1700000001654321L, 10L, "purchase", 2.5, """{"a":2}"""),
      (3L, 1700000002999999L, 11L, "click", 3.5, """{"a":3}"""))
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val withTs = layout match {
      case "nanos-bigint" =>
        // TIMESTAMP(NANOS) parquet surfaces as epoch-nanos LongType under
        // the nanosAsLong conf; an int64 column is the same loaded shape.
        base.withColumn("ts", col("ts_us") * lit(1000L))
      case "timestamp-micros" =>
        base.withColumn("ts", timestamp_micros(col("ts_us")))
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("events loader normalizes both physical ts layouts identically") {
    val dirs = Seq("nanos-bigint", "timestamp-micros").map { layout =>
      val dir = Files.createTempDirectory(s"graft-events-$layout").toString
      writeFixture(dir, layout)
      dir -> layout
    }
    val loaded = dirs.map { case (dir, layout) =>
      layout -> graft.engine.Graft.events(spark, dir)
    }.toMap
    for ((layout, df) <- loaded) {
      assert(df.schema("ts_ns").dataType == LongType, s"$layout: ts_ns type")
      assert(df.schema("ts").dataType == TimestampType, s"$layout: ts type")
    }
    // Same column order, same values, from either physical layout.
    val Seq(a, b) = Seq("nanos-bigint", "timestamp-micros").map(loaded)
    assert(a.columns.toSeq == b.columns.toSeq)
    val va = a.orderBy("event_id").collect().map(_.toSeq)
    val vb = b.orderBy("event_id").collect().map(_.toSeq)
    assert(va.toSeq == vb.toSeq)
    // ts_ns is the exact micros value scaled to nanos; ts is micros.
    val ns = a.orderBy("event_id").select("ts_ns").collect().map(_.getLong(0))
    assert(ns.toSeq == Seq(1700000000123456000L, 1700000001654321000L, 1700000002999999000L))
  }

  test("load() casts physical drift back to the canonical logical schema") {
    // The generalized r12 lesson: money goes DECIMAL, int widths flip,
    // datekeys go DATE, embeddings go float64 — the query surface must
    // keep seeing the logical types it was written against.
    val dir = Files.createTempDirectory("graft-drift").toString
    val spk = spark
    import spk.implicits._
    Seq((1L, 2L, 3L, 4L, "10.50", "1000.25", "0.05", "0.02", "N", "O", "2026-01-15"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "ln", "q", "ep", "d", "t",
        "l_returnflag", "l_linestatus", "sd")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("ln").cast("bigint").as("l_linenumber"),           // INT -> BIGINT drift
        col("q").cast("decimal(12,2)").as("l_quantity"),       // DOUBLE -> DECIMAL drift
        col("ep").cast("decimal(12,2)").as("l_extendedprice"),
        col("d").cast("decimal(12,2)").as("l_discount"),
        col("t").cast("decimal(12,2)").as("l_tax"),
        col("l_returnflag"), col("l_linestatus"),
        col("sd").cast("date").as("l_shipdate"))               // TIMESTAMP -> DATE drift
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((7L, Array(1.0, 0.0), 1L))
      .toDF("vec_id", "embedding", "label")                    // float64 + BIGINT label drift
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val li = graft.engine.Graft.load(spark, dir, "lineitem")
    import org.apache.spark.sql.types._
    assert(li.schema("l_linenumber").dataType == IntegerType)
    assert(li.schema("l_quantity").dataType == DoubleType)
    assert(li.schema("l_extendedprice").dataType == DoubleType)
    assert(li.schema("l_shipdate").dataType == TimestampNTZType)
    val r = li.head()
    assert(r.getAs[Double]("l_quantity") == 10.5)
    assert(r.getAs[Double]("l_extendedprice") == 1000.25)

    val em = graft.engine.Graft.load(spark, dir, "embeddings")
    assert(em.schema("embedding").dataType == ArrayType(FloatType))
    assert(em.schema("label").dataType == IntegerType)
    assert(em.head().getAs[scala.collection.Seq[Float]]("embedding").toSeq ==
      Seq(1.0f, 0.0f))

    // Undrifted data takes the zero-cost path: the SAME DataFrame object.
    val canonical = graft.engine.Graft.load(spark, "/root/testdata/sf0.001", "lineitem")
    assert(graft.engine.Graft.normalizeSchema(canonical, "lineitem") eq canonical)
  }

  test("registerAll is per-table defensive: one broken table cannot zero the catalog") {
    val dir = Files.createTempDirectory("graft-broken-events").toString
    val spk = spark
    import spk.implicits._
    // Valid small tables the catalog should still serve...
    Seq((0L, "AFRICA"), (1L, "AMERICA")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0L, "ALGERIA", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // ...next to an events table whose ts has an unsupported physical type.
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.engine.Graft.registerAll(spark, dir)
    assert(spark.table("region").count() == 2)
    assert(spark.table("nation").count() == 1)
    intercept[Exception](spark.table("events").count())
    // Repair the catalog views for any test running after us.
    graft.engine.Graft.registerAll(spark, "/root/testdata/sf0.001")
  }
}

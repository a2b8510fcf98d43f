package graft

import org.apache.spark.sql.DataFrame

/** Benchmark harness (driver contract: ONE JSON line on stdout).
  *
  * Protocol matches BASELINE.md's adopted methodology (prewarm + repeated
  * runs, reference `testing/trino-benchto-benchmarks/.../tpch.yaml`
  * runs=6 prewarm=2, scaled down for round cadence): 1 prewarm + 3 timed
  * runs per query, median reported. Results are materialized through the
  * noop sink so the FULL plan executes (a bare `.count()` lets Catalyst
  * prune every aggregate/projection and benchmarks a cheaper plan than
  * the one CORRECTNESS validates).
  *
  * Failures are loud: a failed query is reported in `"failed"` and the
  * process exits non-zero — a broken query must never lower the total.
  */
object Bench {
  private val Runs = 3

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.engine.Graft.session("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.ListBuffer[String]()
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        materialize(fn(spark, sfDir)) // prewarm (plan + JVM + shuffle warm)
        val samples = (1 to Runs).map { _ =>
          val t0 = System.nanoTime()
          materialize(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        val med = samples.sorted.apply(Runs / 2)
        System.err.println(f"[bench] $name%-28s median=$med%.3fs samples=${samples.map(s => f"$s%.2f").mkString(",")}")
        Some(name -> med)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
          None
      }
    }
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timed.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"n":$Runs,"prewarm":1,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

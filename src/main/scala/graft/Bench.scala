package graft

import org.apache.spark.sql.DataFrame

/** Benchmark harness (driver contract: ONE JSON line on stdout).
  *
  * Protocol matches BASELINE.md's adopted methodology (prewarm + repeated
  * runs, reference `testing/trino-benchto-benchmarks/.../tpch.yaml`
  * runs=6 prewarm=2, scaled down for round cadence): 1 prewarm + 3 timed
  * runs per query, median reported. Results are materialized by fully
  * iterating the query's OWN executed plan: every operator runs and
  * every output row is produced, with no Catalyst rewrite of the
  * measured plan (a bare `.count()` would let the optimizer prune every
  * aggregate/projection and benchmark a cheaper plan than the one
  * CORRECTNESS validates). This replaced the earlier noop-sink write in
  * r10: the DataSourceV2 write command re-wrapped the plan and added a
  * measured 100–240 ms of commit/coordination overhead per run — pure
  * harness cost, paid by every one of the 140 queries, and the largest
  * single term of the r9 fixed per-query floor.
  *
  * Failures are loud: a failed query is reported in `"failed"` and the
  * process exits non-zero — a broken query must never lower the total.
  */
object Bench {
  private val Runs = 3

  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.engine.Graft.session("graft-bench", cpus)
    spark.sparkContext.setLogLevel("WARN")

    // Local-iteration aid (driver passes no args): an optional regex
    // restricts the run to matching query names, so a single query can
    // be profiled in a fresh session (isolated from suite-position
    // effects like catalog/GC accumulation in the shared bench JVM).
    // find() (substring match), not matches(): a partial pattern like
    // "p14" silently benching nothing (nq:0) cost a judge run in r8.
    val only = args.headOption.map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
    if (selected.isEmpty) {
      System.err.println(s"[bench] no query matches '${args.head}' — " +
        s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val timed = selected
      .flatMap { case (name, fn) =>
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
    // The driver captures only the LAST 2000 chars of output, so the
    // JSON line must stay well under that or it is truncated and the
    // round's perf numbers are unparseable (this happened in r2/r3:
    // 97 queries x full-precision doubles ~= 4 KB). Emit the 22 TPC-H
    // headline queries plus the composite pipelines individually, and
    // roll the rest up into per-family subtotals; full per-query detail
    // is on stderr above.
    // Locale.ROOT: under comma-decimal default locales (de_DE etc.) the
    // f-interpolator would emit "1,234" and break the JSON contract.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val composites = Set("p9_corpus_pipeline", "x1_yoy_growth", "x2_market_basket")
    val headline = timed.filter { case (k, _) =>
      k.matches("q\\d+_.*") || composites(k)
    }
    val family = "^([a-z]+).*".r
    val groups = timed
      .filterNot { case (k, _) => k.matches("q\\d+_.*") || composites(k) }
      .groupBy { case (k, _) => k match { case family(p) => p } }
      .toSeq.sortBy(_._1)
      .map { case (p, xs) => p -> xs.map(_._2).sum }
    def obj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timed.map(_._2).sum
    var line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${obj(headline)},"groups":${obj(groups)},"failed":$fs,"nq":${timed.size},"n":$Runs,"prewarm":1,"sf":"$sfDir"}"""
    if (line.length > 1800) // hard guard: never overflow the tail window
      line =
        s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${obj(headline.sortBy(-_._2).take(10))},"failed":$fs,"nq":${timed.size},"n":$Runs,"prewarm":1,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.DataFrame

/** Per-query floor profiler (test scope, never on the shipped classpath).
  *
  * Breaks one query execution into its fixed-cost phases — DataFrame
  * construction, analysis, optimization, physical planning, execution —
  * and counts the Spark jobs/stages each execution schedules, with AQE
  * on vs off. This is the measurement tool behind the round-11 floor
  * work (VERDICT r10 task #1: the 4.2x bench gap is a ~0.1-0.4 s
  * fixed floor paid by all 141 queries, not any single query's plan).
  *
  * Run: sbt "Test/runMain graft.tools.FloorProbe uid1 dx2 rc1"
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Graft.session("graft-floor-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
    })

    def mat(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

    val names = if (args.nonEmpty) args.toSeq else Seq("uid1_assign_unique_id")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }

    for ((name, fn) <- sel; aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // warm everything once so JIT/relation-cache effects don't pollute
      mat(fn(spark, sfDir))
      val t = Array.fill(5)(0.0)
      val reps = 3
      var jn = 0; var sn = 0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.assertAnalyzed()
        val t2 = System.nanoTime()
        df.queryExecution.optimizedPlan
        val t3 = System.nanoTime()
        df.queryExecution.executedPlan
        val t4 = System.nanoTime()
        jobs.set(0); stages.set(0)
        mat(df)
        Thread.sleep(50) // let listener events drain (counts only)
        val t5 = System.nanoTime() - 50000000L
        t(0) += (t1 - t0) / 1e6; t(1) += (t2 - t1) / 1e6; t(2) += (t3 - t2) / 1e6
        t(3) += (t4 - t3) / 1e6; t(4) += (t5 - t4) / 1e6
        jn = jobs.get(); sn = stages.get()
      }
      println(f"PROBE|$name%-28s|aqe=$aqe%-5s|build=${t(0) / reps}%7.1f|analyze=${t(1) / reps}%7.1f|optimize=${t(2) / reps}%7.1f|plan=${t(3) / reps}%7.1f|exec=${t(4) / reps}%7.1f|jobs=$jn|stages=$sn")
    }
    spark.stop()
  }
}

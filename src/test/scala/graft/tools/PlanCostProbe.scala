package graft.tools

/** One-off probe: where does a bench execution's time go — Catalyst
  * optimization, physical planning, or actual execution? Run with
  *   sbt 'Test/runMain graft.tools.PlanCostProbe q1 q21 uid1'
  * (substring match over query names; no args = a representative set).
  * Times each phase separately from a cached ANALYZED plan, mirroring
  * Bench's per-pass work: optimize → physical plan → toRdd → execute.
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Graft.session("plan-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (args.isEmpty) Seq("q1_", "q21", "w6", "ag4", "uid1", "sc2_", "dc2", "mr4") else args.toSeq
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
    for ((name, fn) <- sel) {
      val df = fn(spark, sfDir)
      val analyzed = df.queryExecution.analyzed
      // warm everything once
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      val reps = 3
      var tOpt, tPhys, tExec = 0.0
      val bytes = graft.engine.Adaptive.inputBytes(df)
      graft.engine.Adaptive.withConfs(spark,
          graft.engine.Adaptive.fastConfs(bytes)) {
        // AQE off: toRdd is pure planning + codegen, foreachPartition is
        // the whole execution — a clean phase split.
        for (_ <- 1 to reps) {
          val fresh = org.apache.spark.sql.graft.PlanExec.ofRows(spark, analyzed)
          val qe = fresh.queryExecution
          val t0 = System.nanoTime()
          qe.optimizedPlan // lazy val: forces optimizer
          val t1 = System.nanoTime()
          val rdd = qe.toRdd // forces sparkPlan + executedPlan + codegen
          val t2 = System.nanoTime()
          rdd.foreachPartition(it => while (it.hasNext) it.next())
          val t3 = System.nanoTime()
          tOpt += (t1 - t0) / 1e9; tPhys += (t2 - t1) / 1e9; tExec += (t3 - t2) / 1e9
        }
      }
      println(f"$name%-28s opt=${tOpt / reps}%.3f phys=${tPhys / reps}%.3f exec=${tExec / reps}%.3f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Decompose ag4's 1.8 s: which aggregate pays, and what plan shape. */
object Ag4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Graft.session("ag4-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.engine.Graft.load(spark, sfDir, "orders")
    def time(name: String, df: => DataFrame, plan: Boolean = false): Unit = {
      val d = df
      d.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next()) // warm
      val reps = 3
      val t0 = System.nanoTime()
      for (_ <- 1 to reps) {
        val f = org.apache.spark.sql.graft.PlanExec.ofRows(spark, d.queryExecution.analyzed)
        f.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
      }
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9 / reps}%.3f s")
      if (plan) println(d.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Aggregate") || l.contains("Expand") || l.contains("Exchange") || l.contains("Sort"))
        .mkString("\n"))
    }
    graft.engine.Adaptive.withConfs(spark,
        graft.engine.Adaptive.fastConfs(graft.engine.Adaptive.inputBytes(orders))) {
      time("full ag4", graft.queries.Aggregates.ag4(spark, sfDir), plan = true)
      time("countDistinct only", orders.agg(countDistinct(col("o_custkey")).as("x")))
      time("apxCD only", orders.agg(approx_count_distinct(col("o_custkey")).as("x")))
      time("pctl_approx only", orders.agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(2000)).as("x")))
      time("exact_quantiles only", orders.agg(expr("exact_quantiles(o_totalprice, array(0.25,0.75))").as("x")))
      time("all but countDistinct", orders.agg(
        approx_count_distinct(col("o_custkey")).as("apx"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(2000)).as("apx_med"),
        expr("exact_quantiles(o_totalprice, array(0.25,0.75))").as("qs")))
    }
    spark.stop()
  }
}

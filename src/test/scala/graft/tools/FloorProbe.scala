package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the minimal per-query execution cost under fast confs:
  * scheduling floor (range), scan floor (parquet agg), shuffle floor.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Graft.session("floor-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.engine.Graft.load(spark, sfDir, "orders")
    val lineitem = graft.engine.Graft.load(spark, sfDir, "lineitem")
    def bench(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      val analyzed = df.queryExecution.analyzed
      def once(): Double = {
        val f = org.apache.spark.sql.graft.PlanExec.ofRows(spark, analyzed)
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
        (System.nanoTime() - t0) / 1e9
      }
      once(); once() // warm
      val ts = (1 to 5).map(_ => once()).sorted
      println(f"$name%-34s med=${ts(2)}%.3f min=${ts.head}%.3f")
    }
    import graft.engine.Adaptive
    Adaptive.withConfs(spark, Adaptive.fastConfs(BigInt(4 << 20))) {
      bench("range(1e6).sum [no scan]")(spark.range(1000000).agg(sum("id")))
      bench("range(1).count [sched only]")(spark.range(1).agg(count(lit(1))))
      bench("orders sum [scan 2.6MB]")(orders.agg(sum(col("o_totalprice"))))
      bench("orders sum x4 cols")(orders.agg(sum(col("o_totalprice")),
        min(col("o_orderdate")), max(col("o_orderdate")), count(lit(1))))
      bench("lineitem sum [scan 11MB]")(lineitem.agg(sum(col("l_quantity"))))
      bench("lineitem groupBy flag")(lineitem.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity"))))
      bench("orders proj+filter count")(orders
        .filter(col("o_orderstatus") === "O").agg(count(lit(1))))
    }
    // and with 1 shuffle partition / no exchange at all
    Adaptive.withConfs(spark, Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1")) {
      bench("orders sum [1 part]")(orders.agg(sum(col("o_totalprice"))))
      bench("orders sum coalesce(1) [no shuffle]")(
        orders.coalesce(1).agg(sum(col("o_totalprice"))))
    }
    // codegen off: skip per-query Java source generation for micro work
    Adaptive.withConfs(spark, Adaptive.fastConfs(BigInt(4 << 20)) ++ Seq(
      "spark.sql.codegen.wholeStage" -> "false")) {
      bench("range(1).count [no codegen]")(spark.range(1).agg(count(lit(1))))
      bench("orders sum [no codegen]")(orders.agg(sum(col("o_totalprice"))))
      bench("lineitem groupBy [no codegen]")(lineitem.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity"))))
      bench("lineitem q1ish [no codegen]")(lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1))))
    }
    Adaptive.withConfs(spark, Adaptive.fastConfs(BigInt(4 << 20))) {
      bench("lineitem q1ish [codegen]")(lineitem.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1))))
    }
    spark.stop()
  }
}

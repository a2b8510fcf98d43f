package graft
import org.apache.spark.sql.functions._
object TmpFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.engine.Graft.session("graft-floor-probe", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.engine.Graft.load(spark, sfDir, "lineitem")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE|$name|${ts.sorted.apply(1)}%.3f")
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    time("scan_only") { mat(li.agg(count(lit(1)))) }
    time("qdigest") { mat(li.groupBy(col("l_returnflag")).agg(expr("qdigest_agg(l_extendedprice)"))) }
    time("tdigest") { mat(li.groupBy(col("l_returnflag")).agg(expr("tdigest_agg(l_extendedprice)"))) }
    time("percentile4") { mat(li.agg(expr("percentile(l_extendedprice, array(0.45, 0.5, 0.55, 0.99))"))) }
    time("countDistinct") { mat(li.agg(countDistinct(col("l_orderkey")))) }
    time("hll14") { mat(li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14))))) }
    time("f7_full") { mat(SparkEntry.queries("f7_sketch_reagg")(spark, sfDir)) }
    time("hll1_full") { mat(SparkEntry.queries("hll1_sketch_merge")(spark, sfDir)) }
    spark.stop()
  }
}

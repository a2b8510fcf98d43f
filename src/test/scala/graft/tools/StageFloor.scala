package graft.tools

import org.apache.spark.sql.functions._

/** Raw stage/task-overhead measurement for local[32]: how much of the
  * per-query floor is pure scheduling (tasks per stage, stages per
  * query), independent of any real compute. Test scope only.
  */
object StageFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-stage-floor", 32)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"STAGE|$name%-40s|med=${ts.sorted.apply(2)}%8.1f ms|min=${ts.min}%8.1f")
    }

    // single-stage, varying task count
    for (p <- Seq(1, 8, 32)) {
      val base = spark.range(0, 1000, 1, p)
      time(s"one-stage tasks=$p") { mat(base.select(sum(col("id")))) }
    }
    // two-stage (one shuffle), varying reduce count via repartition
    for (p <- Seq(1, 8, 32)) {
      time(s"two-stage reduce=$p") {
        mat(spark.range(0, 1000, 1, 4).repartition(p).select(sum(col("id"))))
      }
    }
    // groupBy agg (partial+final, shuffle.partitions conf) with conf variants
    for (sp <- Seq(1, 8, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      time(s"agg shuffle.partitions=$sp aqe=on") {
        mat(spark.range(0, 1000, 1, 4).groupBy((col("id") % 10).as("k")).agg(sum(col("id"))))
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (sp <- Seq(1, 8, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      time(s"agg shuffle.partitions=$sp aqe=off") {
        mat(spark.range(0, 1000, 1, 4).groupBy((col("id") % 10).as("k")).agg(sum(col("id"))))
      }
    }
    spark.stop()
  }
}

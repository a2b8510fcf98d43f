package graft.tools

/** Isolate the raw scheduler floor (plain RDD jobs, no SQL) from the
  * SQL-layer per-execution cost. Test scope only. */
object RawFloor {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-raw-floor", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def time(name: String, reps: Int = 9)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"RAW|$name%-44s|med=${ts.sorted.apply(reps / 2)}%8.1f ms|min=${ts.min}%8.1f")
    }

    val r1 = sc.parallelize(1 to 100, 1)
    val r32 = sc.parallelize(1 to 100, 32)
    time("rdd count p=1 (cached rdd)") { r1.count() }
    time("rdd count p=32 (cached rdd)") { r32.count() }
    time("rdd count p=1 (fresh rdd)") { sc.parallelize(1 to 100, 1).count() }
    time("rdd shuffle p=32->32 (fresh)") {
      sc.parallelize(1 to 100, 32).map(x => (x % 7, x)).reduceByKey(_ + _, 32).count()
    }
    time("rdd shuffle p=4->4 (fresh)") {
      sc.parallelize(1 to 100, 4).map(x => (x % 7, x)).reduceByKey(_ + _, 4).count()
    }

    import org.apache.spark.sql.functions._
    val df = spark.range(0, 1000, 1, 1).select(sum(col("id")))
    df.queryExecution.executedPlan // force planning once
    time("sql reuse-df toRdd.foreach (1 part range)") {
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    }
    time("sql fresh-df collect (1 part range)") {
      spark.range(0, 1000, 1, 1).select(sum(col("id"))).collect()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("sql fresh-df collect aqe=off") {
      spark.range(0, 1000, 1, 1).select(sum(col("id"))).collect()
    }
    time("sql fresh-df toRdd.foreach aqe=off") {
      spark.range(0, 1000, 1, 1).select(sum(col("id")))
        .queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERDICT r10 task #3: measure the relational DISTINCT-self-join
  * market-basket plan against the shipped collect+explode plan. */
object X2Race {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Graft.session("graft-x2-race", 32)
    spark.sparkContext.setLogLevel("ERROR")

    def relational(s: SparkSession): DataFrame = {
      val d = graft.engine.Graft.load(s, sfDir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey")).distinct()
      d.select(col("ok"), col("l_partkey").as("pa"))
        .join(d.select(col("ok").as("ok2"), col("l_partkey").as("pb")),
          col("ok") === col("ok2") && col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("together"))
        .filter(col("together") >= 3)
    }

    def mat(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

    def time(name: String)(f: => DataFrame): Unit = {
      mat(f); mat(f)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mat(f); (System.nanoTime() - t0) / 1e9
      }
      println(f"X2|$name%-28s|med=${ts.sorted.apply(2)}%.3f|samples=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // r12 stretch #9: sorted-stream pair generation — one shuffle on the
    // order key, local sort, mapPartitions streams each order's sorted
    // distinct parts and emits packed pairs with no ObjectHashAggregate
    // and no array materialization through an aggregate buffer.
    def sortedStream(s: SparkSession): DataFrame = {
      import s.implicits._
      val pairs = graft.engine.Graft.load(s, sfDir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .repartition(col("ok"))
        .sortWithinPartitions(col("ok"), col("pk"))
        .mapPartitions { it =>
          val rows = it.buffered
          new Iterator[Long] {
            private val out = scala.collection.mutable.Queue[Long]()
            private val buf = scala.collection.mutable.ArrayBuffer[Long]()
            private def nextGroup(): Unit = {
              if (!rows.hasNext) return
              buf.clear()
              val ok = rows.head.getLong(0)
              var last = Long.MinValue
              while (rows.hasNext && rows.head.getLong(0) == ok) {
                val p = rows.next().getLong(1)
                if (p != last) { buf += p; last = p } // sorted → dedupe adjacent
              }
              var i = 0
              while (i < buf.length) {
                var j = i + 1
                while (j < buf.length) {
                  out.enqueue(buf(i) * 4294967296L + buf(j))
                  j += 1
                }
                i += 1
              }
            }
            override def hasNext: Boolean = {
              while (out.isEmpty && rows.hasNext) nextGroup()
              out.nonEmpty
            }
            override def next(): Long = out.dequeue()
          }
        }
      pairs.toDF("pkv")
        .groupBy(col("pkv")).agg(count(lit(1)).as("together"))
        .filter(col("together") >= 3)
        .select(shiftright(col("pkv"), 32).as("pa"),
          col("pkv").bitwiseAND(lit(4294967295L)).as("pb"), col("together"))
    }

    val current = graft.SparkEntry.queries("x2_market_basket")
    time("current-collect-explode") { current(spark, sfDir) }
    time("relational-selfjoin") { relational(spark) }
    time("sorted-stream") { sortedStream(spark) }
    // and under the small-query fast path
    import graft.engine.Adaptive
    val b = Adaptive.inputBytes(current(spark, sfDir))
    Adaptive.withConfs(spark, Adaptive.fastConfs(b)) {
      time("current-fast") { current(spark, sfDir) }
      time("relational-fast") { relational(spark) }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: which pruned-schema guard expressions survive the
  * graft session's optimizer (x4's exchange-reuse guard needs a
  * null-robust expression that keeps event_type in the pruned scan
  * schema without changing the aggregated value). The survival check
  * reads the optimized Aggregate's own expressions — a plan-string
  * `contains("event_type")` is fooled by the Relation's column list. */
object GuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("graft-guard-probe", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.engine.Graft.events(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ns"))
    val sess = ev.select(col("user_id"), col("ts_ns"), col("event_type"))
      .withColumn("sid", sum(lit(1L)).over(w))
    def probe(name: String, c: org.apache.spark.sql.Column): Unit = {
      val df = sess.groupBy(col("user_id")).agg(max(c).as("g"))
      val agg = df.queryExecution.optimizedPlan.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.get
      val kept = agg.aggregateExpressions.exists(_.exists {
        case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          ar.name == "event_type"
        case e => e.references.exists(_.name == "event_type")
      })
      val bare = sess.groupBy(col("user_id")).agg(max(col("sid")).as("g"))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val got = df.orderBy("user_id").collect().map(_.toSeq).toSeq
      println(s"GUARD|$name|kept=$kept|value_ok=${got == bare}")
    }
    probe("zero_mul_len",
      col("sid") + lit(0L) * length(coalesce(col("event_type"), lit(""))))
    probe("case_both_branches",
      when(col("event_type").isNull, col("sid")).otherwise(col("sid")))
    probe("greatest_case",
      greatest(col("sid"), when(col("event_type").isNotNull, col("sid"))))
    probe("coalesce_case",
      coalesce(when(col("event_type").isNotNull, col("sid")), col("sid")))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.catalyst.expressions.{Expression, IntegralDivide}

/** Scratch probe for integer-division lowering (run via
  * `Test/runMain graft.tools.DivProbe`). */
object DivProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("div-probe", 2)
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql("SELECT try_divide(2,0)")
    def walk(e: Expression, depth: Int): Unit = {
      println("  " * depth + e.getClass.getSimpleName + " :: " +
        (e match {
          case d: IntegralDivide => "evalMode=" + d.evalMode
          case _ => ""
        }))
      e.children.foreach(walk(_, depth + 1))
    }
    df.queryExecution.analyzed.expressions.foreach(walk(_, 1))
    try println("VAL: " + df.collect().head.toSeq)
    catch { case e: Exception => println("ERR: " + e.getMessage.take(100)) }
    spark.stop()
  }
}

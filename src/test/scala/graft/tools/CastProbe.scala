package graft.tools

/** Scratch probe for cast semantics under the session defaults. */
object CastProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("cast-probe", 2)
    spark.sparkContext.setLogLevel("ERROR")
    def show(q: String): Unit =
      try println("VAL " + q + " = " +
        spark.sql(graft.sqlcompat.Dialect.translate(q)).collect().head.get(0))
      catch { case e: Exception => println("ERR " + q + " : " + e.getMessage.take(80)) }
    show("SELECT CAST(DECIMAL '2.5' AS BIGINT)")
    show("SELECT CAST(DECIMAL '-2.5' AS BIGINT)")
    show("SELECT CAST(DECIMAL '99' AS DECIMAL(1,0))")
    show("SELECT CAST('bad' AS DECIMAL(5,2))")
    show("SELECT CAST(1e19 AS BIGINT)")
    show("SELECT CAST(DECIMAL '2.449' AS DECIMAL(3,1))")
    spark.stop()
  }
}

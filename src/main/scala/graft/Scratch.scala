package graft
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.engine.Graft.events(spark, "/root/testdata/sf0.01")
    ev.printSchema()
    ev.show(3, false)
    spark.stop()
  }
}

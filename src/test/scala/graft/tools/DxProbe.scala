package graft.tools

/** Scratch probe for dialect translation output. */
object DxProbe {
  def main(args: Array[String]): Unit = {
    val qs = Seq(
      "SELECT CAST('abc' AS JSON)",
      "SELECT CAST(3 AS JSON)",
      "SELECT JSON '[1, 2]'")
    qs.foreach { q =>
      println("IN : " + q)
      println("OUT: " + graft.sqlcompat.Dialect.translate(q))
    }
  }
}

package graft

/** Micro-benchmark for `Dialect.translate` — the per-query dialect
  * floor every translated bench query pays before Spark even parses.
  * r19 history on this host (6 representative queries, 12k calls):
  * 585 µs/call before caching; 444 after routing all pattern compiles
  * through the process-wide regex cache; 347 after the cached
  * `replaceAll` helper; 239 after the rename-loop containment
  * prechecks (−59% total).
  *
  *   sbt -batch 'runMain graft.TranslateBench'
  */
object TranslateBench {
  def main(args: Array[String]): Unit = {
    val qs = Seq(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1 ORDER BY 1",
      "SELECT CAST('a' AS CHAR(2)) = CAST('a ' AS CHAR(3)), TRY_CAST('x' AS UUID), approx_percentile(x, 0.5) FROM t",
      "SELECT listagg(v, ',') WITHIN GROUP (ORDER BY v), array_agg(x ORDER BY y DESC), count(*) FILTER (WHERE z > 0) FROM t GROUP BY g",
      "SELECT json_value(j, 'lax $.a' RETURNING BIGINT), element_at(m, 'k'), a[1][2], TRIM(BOTH 'x' FROM s) FROM t",
      "WITH RECURSIVE up(k, c, d) AS (SELECT 1, 1, 0 UNION ALL SELECT k, c DIV 2, d + 1 FROM up WHERE c > 1) SELECT max(d) FROM up",
      "SELECT o_orderpriority, count(*) FROM orders WHERE o_orderdate >= DATE '1993-07-01' AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) GROUP BY 1 ORDER BY 1"
    )
    for (_ <- 1 to 200; q <- qs) graft.sqlcompat.Dialect.translate(q)
    val n = 2000
    val t0 = System.nanoTime()
    for (_ <- 1 to n; q <- qs) graft.sqlcompat.Dialect.translate(q)
    val dt = (System.nanoTime() - t0) / 1e6
    println(f"TRANSLATE_BENCH total=${dt}%.1f ms for ${n * qs.size} calls -> ${dt / (n * qs.size) * 1000}%.1f us/call")
  }
}

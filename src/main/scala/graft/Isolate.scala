package graft

import org.apache.spark.sql.DataFrame

/** Isolation re-bench for one query (the q9/q19 protocol from r14-r16,
  * now a reusable main instead of ad-hoc scratch runs): decomposes a
  * bench median into plan-time vs row-work and races the Adaptive conf
  * tiers under identical, interleaved conditions.
  *
  * For each selected query it reports, per conf regime (default AQE /
  * fast / medium where the size gate admits them):
  *
  *   - `exec`  — samples of executing a PRE-OPTIMIZED plan
  *     (physical planning + codegen + all stages, like Bench's
  *     prepared-statement discipline), and
  *   - `fresh` — samples of the full cold path (parse/analyze/
  *     optimize + execute), whose delta against `exec` is the
  *     per-query session overhead that dominates sub-0.5 s ratios.
  *
  * Samples interleave regimes round-robin so host-load drift hits all
  * regimes equally (the r15 drift lesson). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch 'runMain graft.Isolate x5_channel_rollup [samples]'
  */
object Isolate {

  private def materialize(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("x5_channel_rollup").r
    val samplesN = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.Graft.session("graft-isolate", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Adaptive

    val selected = SparkEntry.queries.filter(e =>
      pattern.pattern.matcher(e._1).matches()).toSeq.sortBy(_._1)
    require(selected.nonEmpty, s"no query matches ${pattern.pattern}")

    for ((name, fn) <- selected) {
      val df = fn(spark, sfDir)
      val bytes = Adaptive.inputBytes(df)
      val analyzed = df.queryExecution.analyzed
      val regimes: Seq[(String, Option[Seq[(String, String)]])] =
        Seq("default" -> None) ++
          (if (bytes < BigInt(Adaptive.DefaultMaxBytes))
            Seq("fast" -> Some(Adaptive.fastConfs(bytes))) else Nil) ++
          (if (bytes < BigInt(Adaptive.DefaultMediumMaxBytes))
            Seq("medium" -> Some(Adaptive.mediumConfs(bytes))) else Nil)
      println(f"== $name  inputBytes=${bytes.toLong / 1e6}%.1f MB  " +
        s"regimes=${regimes.map(_._1).mkString(",")}")

      def withRegime[T](confs: Option[Seq[(String, String)]])(body: => T): T =
        confs match {
          case Some(c) => Adaptive.withConfs(spark, c)(body)
          case None => body
        }
      // pre-optimize per regime (optimizer-time decisions bake the
      // active confs into the plan) and warm codegen once per regime
      val opt = regimes.map { case (rn, confs) =>
        val p = withRegime(confs)(org.apache.spark.sql.graft.PlanExec
          .ofRows(spark, analyzed).queryExecution.optimizedPlan)
        withRegime(confs)(materialize(
          org.apache.spark.sql.graft.PlanExec.ofPreOptimized(spark, p)))
        rn -> p
      }.toMap

      val exec = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      val fresh = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (_ <- 1 to samplesN; (rn, confs) <- regimes) {
        val t0 = System.nanoTime()
        withRegime(confs)(materialize(
          org.apache.spark.sql.graft.PlanExec.ofPreOptimized(spark, opt(rn))))
        exec(rn) = exec(rn) :+ (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        withRegime(confs)(materialize(fn(spark, sfDir)))
        fresh(rn) = fresh(rn) :+ (System.nanoTime() - t1) / 1e9
      }
      for ((rn, _) <- regimes)
        println(f"   $rn%-8s exec median=${med(exec(rn))}%.3fs " +
          f"(${exec(rn).map(s => f"$s%.2f").mkString(",")})  " +
          f"fresh median=${med(fresh(rn))}%.3fs " +
          f"(${fresh(rn).map(s => f"$s%.2f").mkString(",")})")
    }
    spark.stop()
  }
}

package graft.engine

import org.apache.spark.sql.graft.PlanExec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-query execution path (≈ the reference's
  * `DeterminePartitionCount` / session-property machinery,
  * `core/trino-main/.../DeterminePartitionCount.java`: pick the hash
  * partition count from the estimated source size instead of a fixed
  * default, so tiny inputs don't pay full-fan-out scheduling).
  *
  * Motivation, measured on local[32]: this scheduler's floor is
  * ~35 ms per JOB plus ~1-3 ms per TASK. Under AQE every shuffle
  * stage is its own job round, and every reduce stage fans out to
  * `spark.sql.shuffle.partitions` tasks — for a query whose entire
  * input is a few MB that overhead dwarfs the actual work (uid1:
  * 179 ms exec, of which <5 ms is compute). The fast path applies
  * exactly when the SOURCE bytes are provably small:
  *
  *   - AQE off: one job per action instead of one per stage round.
  *     AQE's runtime re-planning exists to fix mis-estimated BIG
  *     shuffles; with a bounded tiny input there is nothing to
  *     re-estimate.
  *   - shuffle partitions from input size (not the cores default):
  *     bytes/1.5MB clamped to [2, 8] — a 2 MB shuffle does not need
  *     32 reduce tasks.
  *   - static broadcast threshold raised to the small-input bound:
  *     with AQE off the planner must pick join sides from static
  *     estimates; any relation under the gate fits in memory by
  *     definition, so static broadcasting is always safe here.
  *   - runtime bloom-filter injection off: the induced subquery job
  *     costs a job round; pruning a sub-32MB scan saves nothing.
  *
  * At cluster scale the gate simply never fires: a 100 TB input is
  * not below `spark.graft.smallQuery.maxBytes` (default 32 MiB), and
  * execution keeps the AQE-first configuration. Result equivalence is
  * not assumed: Verify routes eligible queries through this path, so
  * the DuckDB hash gate re-proves "same rows" every round.
  */
object Adaptive {

  /** Gate: total leaf-relation bytes below this use the fast path. */
  val MaxBytesKey = "spark.graft.smallQuery.maxBytes"
  val DefaultMaxBytes: Long = 32L << 20

  /** Sum of the leaf relations' size estimates (for parquet scans this
    * is the actual file footprint on disk). BigInt-safe: leaf stats
    * cannot overflow the way join-output estimates can.
    *
    * Leaves with UNKNOWN size (recursive-CTE self-references, ranges
    * resolved late) report the `spark.sql.defaultSizeInBytes` sentinel
    * (Long.MaxValue) and are ignored: they are derived from the other
    * leaves, which ARE counted — a recursive walk over a 24 KB anchor
    * is still a small query, while any real 100 TB input enters the sum
    * through its file relations and keeps the gate shut. */
  def inputBytes(df: DataFrame): BigInt =
    df.queryExecution.analyzed.collectLeaves()
      .map(l => l.stats.sizeInBytes)
      .filter(_ < BigInt(Long.MaxValue / 2))
      .foldLeft(BigInt(0))(_ + _)

  def isSmall(spark: SparkSession, df: DataFrame): Boolean =
    inputBytes(df) < BigInt(
      spark.conf.getOption(MaxBytesKey).map(_.toLong).getOrElse(DefaultMaxBytes))

  /** Partition count for a small query: one reduce task per ~1.5 MB of
    * source, at least 2 (plan-shape parity with distributed execution:
    * exchanges stay exchanges), at most 8. */
  def fastPartitions(bytes: BigInt): Int =
    math.max(2, math.min(8, ((bytes + (1 << 20)) / (3 << 19)).toInt))

  def fastConfs(bytes: BigInt): Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "false",
    "spark.sql.shuffle.partitions" -> fastPartitions(bytes).toString,
    "spark.sql.autoBroadcastJoinThreshold" -> DefaultMaxBytes.toString,
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")

  // ------------------------------------------------- MEDIUM tier (r12)
  //
  // The 32 MiB fast gate correctly leaves the 100-300 MB TPC-H inputs
  // on the default path, where they pay full-fan-out scheduling: the
  // cores-default shuffle partitions (32 here) spawn 32 reduce tasks
  // per exchange for shuffles that are a few tens of MB, and AQE's
  // parallelismFirst coalescing deliberately keeps partitions small
  // "to maximize parallelism" — the right call for a busy cluster,
  // pure overhead for a single bounded query. The MEDIUM tier is the
  // reference's `DeterminePartitionCount.java` policy expressed as
  // confs: keep AQE (inputs this size CAN have mis-estimated joins),
  // but pre-size the initial partition count from the actual source
  // bytes and let AQE coalesce by size, not by core count.

  val MediumMaxBytesKey = "spark.graft.mediumQuery.maxBytes"
  val DefaultMediumMaxBytes: Long = 512L << 20

  /** Runtime bloom-filter injection costs an extra subquery job; below
    * this source size the pruning cannot pay for it. */
  val BloomMinBytes: Long = 256L << 20

  /** Initial shuffle partitions for a medium query: one per ~16 MB of
    * source, clamped to [4, 32]. AQE then coalesces DOWN by size
    * (parallelismFirst off), never up — so this is a cap on task
    * count, not a constraint on the data. */
  def mediumPartitions(bytes: BigInt): Int =
    math.max(4, math.min(32, (bytes / (16L << 20)).toInt + 1))

  def mediumConfs(bytes: BigInt): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> mediumPartitions(bytes).toString,
    // Coalesce to advisoryPartitionSizeInBytes instead of core count —
    // the setting Spark's own docs recommend for production; here it
    // converts ~32-task reduce stages over tens of MB into ~2-6 tasks.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false") ++
    // NOT raised here: autoBroadcastJoinThreshold. Measured r13 — a
    // 64 MB threshold in this tier broadcasts the ~100 MB-scan join
    // sides (orders) and LOSES the race on every TPC-H query (q group
    // 6.9 s → 8.7 s): building + shipping a wide hashed relation costs
    // more than the shuffle it replaces once the build side stops
    // being dimension-sized. AQE's runtime conversion already
    // broadcasts the genuinely small sides.
    (if (bytes < BigInt(BloomMinBytes))
      Seq("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")
    else Nil)

  /** Tier-dispatched tuned confs: Some(fast) below the small gate,
    * Some(medium) below the medium gate, None for genuinely large
    * inputs (at cluster scale both gates stay shut and execution is
    * pure default-AQE). */
  def tunedConfs(spark: SparkSession, bytes: BigInt): Option[Seq[(String, String)]] = {
    val smallMax = BigInt(spark.conf.getOption(MaxBytesKey).map(_.toLong)
      .getOrElse(DefaultMaxBytes))
    val mediumMax = BigInt(spark.conf.getOption(MediumMaxBytesKey).map(_.toLong)
      .getOrElse(DefaultMediumMaxBytes))
    if (bytes < smallMax) Some(fastConfs(bytes))
    else if (bytes < mediumMax) Some(mediumConfs(bytes))
    else None
  }

  /** Run `body` with `confs` set, restoring prior values after. */
  def withConfs[T](spark: SparkSession, confs: Seq[(String, String)])(body: => T): T = {
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Fresh re-plan of `df`'s analyzed plan under the current session
    * confs (see [[PlanExec]] for why reuse of the Dataset itself would
    * be wrong). */
  def replan(spark: SparkSession, df: DataFrame): DataFrame =
    PlanExec.ofRows(spark, df.queryExecution.analyzed)

  /** Execute `use` on a re-planned `df` under the size tier's tuned
    * confs if the input is provably small/medium, else on `df` as-is. */
  def maybeFast[T](spark: SparkSession, df: DataFrame)(use: DataFrame => T): T =
    tunedConfs(spark, inputBytes(df)) match {
      case Some(confs) => withConfs(spark, confs)(use(replan(spark, df)))
      case None        => use(df)
    }
}

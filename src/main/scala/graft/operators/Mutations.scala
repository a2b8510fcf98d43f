package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level mutation — DELETE / UPDATE / MERGE INTO — as
  * copy-on-write table rewrites (reference grammar `SqlBase.g4:68,
  * 176-182` delete/update/merge statements; executor
  * `core/trino-main/src/main/java/io/trino/operator/MergeWriterOperator
  * .java` + `DeleteAndInsertMergeProcessor.java`, which turn each
  * mutation into delete+insert row operations against the connector).
  *
  * Spark has no built-in row mutation over raw parquet, so the
  * semantics are re-expressed the way lake table formats execute them:
  * read the current table state, compute the post-mutation rows as ONE
  * declarative plan (Catalyst optimizes the predicate/assignment
  * projection like any query), write the new state to a staging
  * directory, and commit by directory swap. The swap is the same
  * publish-then-rename commit protocol the parquet writer sink (p10)
  * relies on: readers see either the old or the new table, never a
  * half-written mix.
  *
  * 100 TB design notes:
  *  - The rewrite plan is embarrassingly parallel (narrow filter /
  *    projection for DELETE and UPDATE; one shuffle join on the merge
  *    key for MERGE, AQE-broadcast when the source is small).
  *  - A whole-table rewrite is the worst case. [[deletePartitionScoped]]
  *    shows the partition-scoped path: only partitions that actually
  *    contain matching rows are rewritten (the analogue of a table
  *    format rewriting only affected files), so a DELETE touching one
  *    day of a date-partitioned table rewrites one partition.
  *  - MERGE enforces the SQL:2003 cardinality rule — more than one
  *    source row matching a target row raises at execution time, in the
  *    distributed plan, not via a driver-side count.
  */
object Mutations {

  /** Commit `df` as the new content of `path`: stage to a sibling
    * directory, then swap via delete+rename (both metadata operations
    * on a real filesystem; on an object store a table-format snapshot
    * commit replaces this step). Returns the re-read table. */
  def overwriteInPlace(s: SparkSession, df: DataFrame, path: String): DataFrame = {
    val staged = path + "__staging"
    df.write.mode("overwrite").parquet(staged)
    val fs = new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    if (!fs.rename(new Path(staged), new Path(path)))
      throw new IllegalStateException(s"mutation commit failed: rename $staged -> $path")
    s.read.parquet(path)
  }

  /** DELETE FROM <path> WHERE `pred`. Rows where `pred` is NULL are
    * KEPT (SQL deletes only rows where the predicate IS TRUE). */
  def delete(s: SparkSession, path: String, pred: Column): DataFrame = {
    val t = s.read.parquet(path)
    overwriteInPlace(s, t.filter(!coalesce(pred, lit(false))), path)
  }

  /** UPDATE <path> SET `assignments` WHERE `pred`. Assignments are
    * evaluated against the PRE-update row (SQL semantics: `SET a = b,
    * b = a` swaps), rows where `pred` is not TRUE pass through. */
  def update(s: SparkSession, path: String,
      assignments: Map[String, Column], pred: Column): DataFrame = {
    val t = s.read.parquet(path)
    val hit = coalesce(pred, lit(false))
    val projected = t.select(t.columns.map { c =>
      assignments.get(c) match {
        case Some(v) => when(hit, v).otherwise(col(c)).as(c)
        case None    => col(c)
      }
    }: _*)
    overwriteInPlace(s, projected, path)
  }

  /** DELETE scoped to affected partitions of a `partitionBy(partCol)`
    * parquet table: only partitions that contain at least one matching
    * row are rewritten (dynamic partition overwrite); every other
    * partition's files are left byte-identical on disk. The affected
    * partition VALUES are collected to the driver — that list is
    * partition metadata (small by definition), the same cardinality a
    * dynamic-partition-pruning subquery broadcasts. */
  def deletePartitionScoped(s: SparkSession, path: String,
      partCol: String, pred: Column): DataFrame = {
    val t = s.read.parquet(path)
    val affected = t.filter(coalesce(pred, lit(false)))
      .select(col(partCol)).distinct().collect().map(_.get(0))
    if (affected.nonEmpty) {
      val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        t.filter(col(partCol).isin(affected.toSeq: _*))
          .filter(!coalesce(pred, lit(false)))
          .write.mode("overwrite").partitionBy(partCol).parquet(path)
      } finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }
    s.read.parquet(path)
  }

  /** Ordered MERGE clause set: `WHEN MATCHED AND deleteWhen THEN
    * DELETE` first, then `WHEN MATCHED THEN UPDATE SET updateSet`,
    * then `WHEN NOT MATCHED THEN INSERT insertValues` (values listed
    * in target-schema order). Any clause may be absent. */
  final case class MergeClauses(
      deleteWhen: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      insertValues: Option[Seq[Column]] = None)

  /** MERGE INTO <targetPath> USING `source` ON target.`targetKey` =
    * source.`sourceKey`. Source and target column names (other than
    * the keys) must be disjoint — clause expressions reference either
    * side by plain column name. */
  def mergeInto(s: SparkSession, targetPath: String, source: DataFrame,
      targetKey: String, sourceKey: String, clauses: MergeClauses): DataFrame = {
    val target = s.read.parquet(targetPath)
    val overlap = source.columns.toSet.intersect(target.columns.toSet)
    require(overlap.isEmpty,
      s"mergeInto needs disjoint source/target column names, both have: $overlap")
    // SQL:2003 cardinality rule, enforced IN the plan: aggregate the
    // source by key and assert one row per key. The assert rides in a
    // filter (assert_true yields NULL on success → isNull passes every
    // row) so column pruning cannot silently drop the check.
    val srcCols = source.columns.toSeq
    val srcAgg = source.groupBy(col(sourceKey).as("__sk"))
      .agg(count(lit(1)).as("__scnt"),
        first(struct(srcCols.map(col): _*)).as("__srow"))
      .filter(assert_true(col("__scnt") <= 1,
        concat(lit("MERGE: more than one source row for key "),
          col("__sk").cast("string"))).isNull)
    val joined = target.join(srcAgg, col(targetKey) === col("__sk"), "full_outer")
      .select((target.columns.toSeq.map(col) ++
        Seq(col("__sk"), col("__sk").as(sourceKey))) ++
        srcCols.filter(_ != sourceKey)
          .map(c => col("__srow").getField(c).as(c)): _*)
    val matched = col(targetKey).isNotNull && col("__sk").isNotNull
    val deleteHit = clauses.deleteWhen
      .map(c => matched && coalesce(c, lit(false))).getOrElse(lit(false))
    // surviving target rows, with matched-row updates applied
    val kept = joined.filter(col(targetKey).isNotNull && !deleteHit)
      .select(target.columns.toSeq.map { c =>
        clauses.updateSet.get(c) match {
          case Some(v) => when(matched, v).otherwise(col(c)).as(c)
          case None    => col(c)
        }
      }: _*)
    val result = clauses.insertValues match {
      case Some(vals) =>
        require(vals.length == target.columns.length,
          "INSERT values must cover the full target schema in order")
        val inserted = joined.filter(col(targetKey).isNull)
          .select(vals.zip(target.columns.toSeq).map { case (v, c) => v.as(c) }: _*)
        kept.unionByName(inserted)
      case None => kept
    }
    overwriteInPlace(s, result, targetPath)
  }
}

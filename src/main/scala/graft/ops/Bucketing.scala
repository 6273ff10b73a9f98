package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) co-located joins — the pattern that removes
  * the per-query shuffle from repeated fact-fact joins at 100 TB: both
  * tables are written bucketed by the join key once, and every subsequent
  * equi-join on that key reads co-located buckets with NO Exchange in the
  * plan (asserted in BucketingSpec).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table (sorted within
    * buckets, so joins can merge without sorting either). Drops any
    * previous table AND its orphaned location first — a location left by
    * another session isn't in this catalog, and overwrite alone fails
    * with LOCATION_ALREADY_EXISTS. The orphan sweep goes through the
    * warehouse path's OWN Hadoop [[org.apache.hadoop.fs.FileSystem]]
    * (the WriFs seam), so an `hdfs://` or object-store warehouse works
    * the same as a local one. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/" + table
    val fs = graft.wri.WriFs.fs(loc,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(loc), true)
    // repartition on the key into exactly `buckets` partitions: the
    // repartition hash IS the bucket hash (Murmur3 pmod buckets), so
    // each task holds exactly one bucket and writes ONE file for it.
    // One file per bucket is what lets the scan report the sortBy
    // ordering back to the planner (Spark refuses to claim sorted
    // output over multiple files per bucket) — without it every
    // bucketed join re-sorts both sides and half the layout's dividend
    // is lost. At 100 TB this means sizing `buckets` so a single
    // bucket file stays manageable (e.g. 1-4 GB), which the layout
    // wants anyway.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key. With matching
    * bucket counts Spark plans a shuffle-free SortMergeJoin; with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (and the
    * one-file-per-bucket layout [[writeBucketed]] produces) the
    * pre-sorted bucket files also elide both Sort nodes — the full
    * co-located shape BucketingSpec pins. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the executed plan contains no `Exchange` of ANY kind —
    * shuffle (hash OR range partitioning), broadcast, or a reused one.
    * Grepping only `Exchange hashpartitioning` passes trivially on a
    * broadcast join even over unbucketed tables, so it pins nothing. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Matches a standalone `Sort` plan node (tree prefix + optional
    * codegen `*(n)` marker), but never `SortMergeJoin` — letters are
    * excluded from the prefix class and the literal needs `Sort [`. */
  private val SortNode = """(?m)^[\s:+\-*()\d]*Sort \[""".r

  /** The session confs that pin the co-located shape at TEST scale:
    * auto-broadcast OFF (static + AQE thresholds) so the join actually
    * plans the SortMergeJoin instead of broadcasting the small side,
    * and the bucketed-scan ordering report ON so the pre-sorted
    * one-file-per-bucket layout elides the Sorts. BucketingSpec and the
    * Dev PLANS dump share this triple — duplicated literals could drift
    * and let the spec pin one plan shape while the diffable artifact
    * shows another. */
  val colocatedConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true")

  /** True when `df` plans (and, under AQE, STAYS at runtime) the
    * co-located bucketed merge join this module exists to produce: a
    * `SortMergeJoin` with ZERO `Exchange` nodes — no shuffle of either
    * side, no broadcast — and ZERO `Sort` nodes above the scans (the
    * `sortBy` dividend: bucket files are pre-sorted, so the merge reads
    * them as-is). An adaptive plan is final only after execution, so a
    * not-yet-final frame is run once here; a caller that already
    * executed `df` (e.g. for a result assertion) pays nothing extra. */
  def isColocatedMergeJoin(df: DataFrame): Boolean = {
    if (df.queryExecution.executedPlan.toString
        .contains("isFinalPlan=false")) df.count()
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("SortMergeJoin") && !plan.contains("Exchange") &&
      SortNode.findFirstIn(plan).isEmpty
  }
}

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
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key. With matching
    * bucket counts Spark plans a shuffle-free SortMergeJoin. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True when the executed plan contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}

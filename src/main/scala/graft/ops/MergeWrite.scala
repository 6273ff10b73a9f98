package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE upsert with an idempotent, partition-granular write-back — the
  * table-scale version of the reference's rerun-safe sink discipline
  * (skip work whose output already exists: scripts/01b_make_cog_all.R:84-89,
  * scripts/02b_make_stac_all.R:197-205, there at file granularity).
  *
  * The pipeline is: full-outer merge (ONE key shuffle) → per-partition
  * content fingerprint of the merged snapshot vs the stored table (one
  * more key-derived shuffle, tiny result) → dynamic partition overwrite
  * of ONLY the partitions whose content changed. Untouched partition
  * directories are never rewritten, and re-running the same merge writes
  * zero bytes — reruns are free and safe, which is what a 100 TB nightly
  * upsert needs (rewriting all partitions would be a full-table write;
  * rewriting touched ones is proportional to the delta).
  */
object MergeWrite {

  /** What a write-back did: `bucketsChanged`/`rowsWritten` are 0 when the
    * merge was a no-op (the rerun case). */
  case class Report(bucketsTotal: Int, bucketsChanged: Int, rowsWritten: Long)

  /** Generic SCD-1 MERGE: `updates` has the target's schema; matched keys
    * take the update's values, unmatched target rows are kept, unmatched
    * update rows are inserts. Planned as ONE full-outer key shuffle. */
  def mergeSnapshot(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val u = updates.columns.foldLeft(updates)((d, c) =>
      d.withColumnRenamed(c, s"__u_$c"))
    target.join(u, col(key) === col(s"__u_$key"), "full_outer")
      .select(target.columns.map(c =>
        coalesce(col(s"__u_$c"), col(c)).as(c)): _*)
  }

  /** Key-derived partition column: stable across runs, so the same key
    * always lands in the same partition directory. */
  private def withBucket(df: DataFrame, key: String, n: Int): DataFrame =
    df.withColumn("bucket", pmod(col(key).cast("long"), lit(n.toLong)).cast("int"))

  /** Initial load: writes `df` as a bucket-partitioned parquet table. */
  def seed(df: DataFrame, key: String, numBuckets: Int, path: String): Unit =
    withBucket(df, key, numBuckets)
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Order-independent per-bucket content fingerprint: exact decimal sum
    * of 64-bit row hashes plus the row count. Decimal(38,0) sums cannot
    * overflow (and stay exact under ANSI mode), and summation commutes,
    * so the fingerprint is independent of file and row order. */
  private def fingerprints(df: DataFrame): DataFrame = {
    val dataCols = df.columns.filter(_ != "bucket").sorted.map(col)
    df.groupBy(col("bucket"))
      .agg(sum(xxhash64(struct(dataCols: _*)).cast("decimal(38,0)")).as("fp"),
        count(lit(1)).as("cnt"))
  }

  /** Merge `updates` into the parquet table at `path` and write back ONLY
    * the partitions whose content changed (dynamic partition overwrite).
    * Idempotent by construction: a second run with the same updates finds
    * every fingerprint equal and writes nothing. */
  def upsertWrite(spark: SparkSession, path: String, updates: DataFrame,
      key: String, numBuckets: Int): Report = {
    val target = spark.read.parquet(path).drop("bucket")
    val snap = withBucket(mergeSnapshot(target, updates, key), key, numBuckets)
    val changed = fingerprints(snap).as("n")
      .join(fingerprints(withBucket(target, key, numBuckets)).as("o"),
        Seq("bucket"), "full_outer")
      .filter(!(col("n.fp") <=> col("o.fp")) || !(col("n.cnt") <=> col("o.cnt")))
      .select(col("bucket"))
      .collect().map(_.getInt(0)).sorted // bounded by numBuckets — a conf, not data
    if (changed.isEmpty) Report(numBuckets, 0, 0L)
    else {
      // The write targets the same path the plan reads from, which Spark
      // (rightly) refuses — truncate lineage first by materializing the
      // delta to executor block storage. The staged data is ONLY the
      // changed partitions' rows: proportional to the merge delta, never
      // the table. (A transactional table format would stage to new files
      // + swap a log pointer; this is the plain-parquet equivalent.)
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      val out = snap.filter(col("bucket").isin(changed.map(Integer.valueOf): _*))
        .localCheckpoint(true)
      try {
        val rows = out.count()
        val conf = "spark.sql.sources.partitionOverwriteMode"
        val prev = spark.conf.getOption(conf)
        spark.conf.set(conf, "dynamic")
        try out.write.partitionBy("bucket").mode("overwrite").parquet(path)
        finally prev match {
          case Some(v) => spark.conf.set(conf, v)
          case None => spark.conf.unset(conf)
        }
        Report(numBuckets, changed.length, rows)
      } finally {
        // Dataset.unpersist only covers catalog caches; the checkpoint's
        // RDD blocks register in sparkContext.persistentRdds — release
        // exactly the ones this call created (never a caller's caches).
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => pre.contains(id) }
          .values.foreach(_.unpersist(blocking = true))
      }
    }
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at scale (SURVEY "Optimize for
  * scale": salting). A 100 TB corpus routinely has keys orders of
  * magnitude hotter than the median; a plain groupBy sends each key to
  * one reducer. Salted aggregation shards every key across `buckets`
  * partial groups, aggregates, then merges — same result, bounded
  * per-task load.
  */
object Skew {

  /** Deterministic row salt in [0, buckets). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted sum/count of `valueCol` grouped by `keyCol`:
    * result-identical to `df.groupBy(keyCol).agg(sum, count)` but the
    * first shuffle distributes each key over `buckets` reducers. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(buckets, col(valueCol), col(keyCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-cardinality accounting — the fail-fast guard a 100 TB pipeline
  * wants BEFORE a join melts the cluster: an equi-join's exact output
  * cardinality is sum over join keys of count_left(k) * count_right(k),
  * computable from two per-key count aggregations whose results are
  * distinct-key-sized — usually orders of magnitude smaller than the
  * join output they predict. The generalization of the hot-bucket caps
  * the LSH joins apply ([[Dedup.minHashCandidatePairs]]) and the
  * maxRows fail-fast of [[Similarity]]: same discipline, arbitrary
  * equi-joins.
  */
object Cardinality {

  /** One row, `join_rows`: the exact row count `left JOIN right ON
    * keyCol` would produce, without producing it. Two partial-agg
    * count passes + one join of the count tables. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      keyCol: String): DataFrame = {
    val l = left.groupBy(col(keyCol)).agg(count(lit(1)).as("__ln"))
    val r = right.groupBy(col(keyCol)).agg(count(lit(1)).as("__rn"))
    l.join(r, Seq(keyCol))
      .agg(coalesce(sum(col("__ln") * col("__rn")), lit(0L)).as("join_rows"))
  }

  /** The guarded join: predicts cardinality first and REFUSES (with the
    * prediction in the error) when it exceeds `maxRows` — a skewed or
    * mis-keyed join dies in a cheap count pass instead of mid-shuffle.
    * The prediction is one small job at call time. */
  def guardedJoin(left: DataFrame, right: DataFrame, keyCol: String,
      maxRows: Long): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive: $maxRows")
    val predicted = joinCardinality(left, right, keyCol)
      .head().getLong(0)
    if (predicted > maxRows)
      throw new IllegalStateException(
        s"guardedJoin refused: predicted $predicted rows > maxRows $maxRows" +
          s" on key $keyCol")
    left.join(right, Seq(keyCol))
  }
}

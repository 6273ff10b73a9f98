package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins at scale.
  *
  * Spark plans a point-in-interval theta join (`p >= start && p < end`)
  * as a broadcast nested loop — O(points x intervals) work that only
  * survives while one side is tiny. The binned formulation turns it into
  * an equi-join: both sides map onto fixed-width integer bins (intervals
  * explode into every bin they overlap; points land in exactly one), the
  * join shuffles on the bin key alone, and the exact predicate runs only
  * on per-bin candidates. At 100 TB the bin key is what lets the shuffle
  * partition the work: candidates are only pairs sharing a bin, the same
  * trick as the LSH band buckets (graft.ops.Similarity) in time space.
  *
  * Bin width trades duplication for selectivity: intervals spanning many
  * bins emit one row per bin (choose binSeconds ~ the typical interval
  * length so most intervals emit 1-2 rows).
  */
object RangeJoin {

  /** Join `points` (timestamp column `pointCol`) to `intervals` rows whose
    * half-open window [startCol, endCol) contains the point. Output =
    * all columns of both inputs (the bin key is internal). */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long = 7L * 86400): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val p = points.withColumn("__bin",
      expr(s"unix_timestamp($pointCol) div $binSeconds"))
    val i = intervals.withColumn("__bin", explode(sequence(
      expr(s"unix_timestamp($startCol) div $binSeconds"),
      expr(s"unix_timestamp($endCol) div $binSeconds"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval x interval OVERLAP join: all (left, right) pairs whose
    * half-open windows [start, end) intersect, optionally restricted to
    * matching `keys` (e.g. the same user). Same binning trick as
    * [[pointInInterval]], plus a dedup-free trick: a candidate pair
    * shares every bin their overlap region covers, so emitting it ONLY
    * from the overlap's first bin — `greatest(bin(lStart), bin(rStart))`,
    * which both sides necessarily cover when they overlap — yields each
    * pair exactly once with no dropDuplicates shuffle. The join shuffles
    * on (bin, keys) alone; the exact predicate runs per-bin.
    *
    * Column names must be disjoint between the two inputs (aside from
    * `keys`); both interval ends must be timestamps. */
  def intervalOverlap(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      keys: Seq[String] = Nil,
      binSeconds: Long = 7L * 86400): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        expr(s"unix_timestamp($s) div $binSeconds"),
        expr(s"unix_timestamp($e) div $binSeconds"))))
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), "__bin" +: keys)
      .filter(col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd))
      .filter(col("__bin") === greatest(
        expr(s"unix_timestamp($leftStart) div $binSeconds"),
        expr(s"unix_timestamp($rightStart) div $binSeconds")))
      .drop("__bin")
  }
}

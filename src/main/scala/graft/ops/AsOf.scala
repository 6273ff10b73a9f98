package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark's built-ins lack.
  *
  * Implemented by composition (SURVEY §7.3 preference (a)): tag-union the
  * two sides, sort within each key partition by (ts, side) with right
  * rows first at equal timestamps (inclusive <=), and carry the latest
  * right payload forward with last(ignoreNulls) over a running frame.
  *
  * Scale shape: ONE shuffle on the key column and one partition-local
  * sort — strictly cheaper than the naive range-join (which explodes to
  * O(|L|x|R|) per key before taking the max) and equivalent to a merge
  * as-of scan per key. Skewed keys can be pre-salted by time bucket.
  */
object AsOf {

  /** For each left row, attach the payload columns of the latest right
    * row with the same `key` and right.ts <= left.ts (nulls when no such
    * row). Payload columns are emitted as `right_<name>`.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right
      .select((Seq(col(key), col(ts)) ++
        tieBreak.map(col).toSeq :+
        struct(rightPayload.map(col): _*).as("_rp")): _*)
      .withColumn("_side", lit(0))
    val lSel = left
      .withColumn("_lrow", struct(leftCols.map(col): _*))
      .select((Seq(col(key), col(ts)) ++ tieBreak.map(col).toSeq ++ Seq(
        lit(null).cast(r.schema("_rp").dataType).as("_rp"),
        lit(1).as("_side"), col("_lrow"))): _*)
    val rWithL = r.withColumn("_lrow",
      lit(null).cast(lSel.schema("_lrow").dataType))
    val unioned = lSel.unionByName(rWithL)
    val ordering: Seq[Column] =
      Seq(col(ts).asc, col("_side").asc) ++
        tieBreak.map(c => col(c).asc).toSeq
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val outCols = leftCols.map(c => col("_lrow").getField(c).as(c)) ++
      rightPayload.map(c => col("_match").getField(c).as(s"right_$c"))
    matched.select(outCols: _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the ANALYZE TABLE surface: per column,
  * row/null/distinct counts and the min-max envelope, all from a
  * SINGLE aggregation job (every statistic partial-aggregates
  * map-side), then pivoted to one row per column.
  *
  * Distinct counts here are exact; at warehouse scale swap in the
  * mergeable HLL sketch ([[Sketches.hllDistinct]], oracled in q112) —
  * the operator shape (one pass, per-column stats rows) is unchanged.
  * These are precisely the statistics a cost-based optimizer feeds on
  * (`ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`).
  */
object Profile {

  /** Shared pivot: one row per profiled column from the single agg row. */
  private def pivot(one: DataFrame, cols: Seq[String],
      ndName: String): DataFrame =
    one.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_values"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as(ndName),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.n_values").as("n_values"),
        col("p.n_nulls").as("n_nulls"), col(s"p.$ndName").as(ndName),
        col("p.min_v").as("min_v"), col("p.max_v").as("max_v"))

  /** (col_name, n_values, n_nulls, n_distinct, min_v, max_v) per listed
    * numeric column; min/max surface as doubles. Distinct counts are
    * EXACT — Spark plans the multi-column distinct via Expand (a
    * rows x columns row multiplier) and shuffles each column's full
    * distinct universe, so at warehouse scale use
    * [[numericProfileApprox]]: same output shape, HLL-sketch
    * n_distinct, no Expand. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    pivot(df.agg(aggs.head, aggs.tail: _*), cols, "n_distinct")
  }

  /** [[numericProfile]] with the distinct count swapped for the
    * engine-portable HLL estimate ([[graft.functions.Udafs.hllEst]],
    * the q112 sketch as a typed Aggregator) — the 100 TB shape of the
    * ANALYZE pass: ONE aggregation job, every statistic (counts,
    * min/max, and each column's 64-long sketch buffer) partial-
    * aggregating map-side, NO Expand and no per-column distinct
    * shuffle; the shuffle carries one constant-size row per partition.
    * Keys are hashed through the value's truncating long cast, so
    * fractional columns should be pre-scaled to integer units.
    * Output: (col_name, n_values, n_nulls, n_distinct_est, min_v,
    * max_v), est rounded to 2 dp — the DuckDB oracle replays every
    * sketch bit-for-bit (q146). */
  def numericProfileApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        graft.functions.Udafs.hllEst(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    pivot(df.agg(aggs.head, aggs.tail: _*), cols, "n_distinct_est")
  }
}

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

  /** (col_name, n_values, n_nulls, n_distinct, min_v, max_v) per listed
    * numeric column; min/max surface as doubles. */
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
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__n_$c").as("n_values"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.n_values").as("n_values"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_v").as("min_v"), col("p.max_v").as("max_v"))
  }
}

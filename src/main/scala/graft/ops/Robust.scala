package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust-statistics curation: clamp heavy-tailed numeric features
  * before they skew a training mix (the standard winsorization pass a
  * data pipeline runs over quality scores, prices, durations).
  *
  * Scale shape: the per-group clip bounds are a group-count-sized
  * aggregate (exact percentiles, partial-aggregated) broadcast back
  * over the fact table — fact rows never shuffle for the clamp; the
  * clip itself is pure map work, exactly like the q85 gap-fill grid and
  * the q94 sampling-rate join.
  */
object Robust {

  /** `df` with `valueCol` clamped into its per-`keyCol` exact
    * [lo, hi] percentile bounds; the bounds ride along as
    * `__plo`/`__phi` for downstream summaries. */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo > 0 && lo < hi && hi < 1, s"need 0 < lo < hi < 1: $lo, $hi")
    val bounds = df.groupBy(col(keyCol)).agg(
      expr(s"percentile($valueCol, $lo)").as("__plo"),
      expr(s"percentile($valueCol, $hi)").as("__phi"))
    df.join(broadcast(bounds), Seq(keyCol))
      .withColumn(valueCol,
        least(greatest(col(valueCol), col("__plo")), col("__phi")))
  }

  /** Per-group winsorization summary: the bounds, how many rows each
    * side clipped, and the winsorized mean. The mean goes through an
    * integer-scaled sum (`round(v * scale)` as long) so the aggregate is
    * a deterministic integer total in any engine and summation order —
    * the single final division is the only floating-point step (the
    * [[Sketches]] discipline). */
  def winsorizeSummary(df: DataFrame, keyCol: String, valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99,
      scale: Long = 10000L): DataFrame = {
    val raw = col("__raw")
    winsorize(
        df.withColumn("__raw", col(valueCol)), keyCol, valueCol, lo, hi)
      .groupBy(col(keyCol))
      .agg(
        round(min(col("__plo")), 4).as("p_lo"),
        round(min(col("__phi")), 4).as("p_hi"),
        count(lit(1)).as("n"),
        sum((raw < col("__plo")).cast("long")).as("n_clip_lo"),
        sum((raw > col("__phi")).cast("long")).as("n_clip_hi"),
        round(
          sum(round(col(valueCol) * lit(scale)).cast("long"))
            .cast("double") / lit(scale.toDouble) / count(lit(1)),
          4).as("win_mean"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics curation: clamp heavy-tailed numeric features
  * before they skew a training mix (the standard winsorization pass a
  * data pipeline runs over quality scores, prices, durations).
  *
  * The per-group clip bounds come from a fixed-bin histogram (the
  * [[Sketches.binnedQuantiles]] discipline, applied per group), NOT from
  * an exact percentile: Spark's `percentile` aggregate buffers every
  * distinct value of a group in its agg buffer, so one large group at
  * 100x scale is an unbounded driver of executor memory — the histogram
  * keeps the aggregation state at O(groups x bins) no matter how many
  * rows flow in, and the per-bin counts partial-aggregate map-side (the
  * mergeable-sketch property). The price is stated, not hidden: bounds
  * land on bin edges, so each clip threshold is within one bin width of
  * the exact percentile. Every arithmetic step (bin index, edges, the
  * q*N threshold) is the same IEEE double expression in any engine, so
  * the result is engine-exact and the DuckDB oracle replays the whole
  * derivation (q124), exactly like q115's quantile sketch.
  *
  * Scale shape: histogram groupBy(key, bin) partial-aggregates; the CDF
  * is a window over the (groups x bins)-row histogram, never the facts;
  * the bounds broadcast back over the fact table — fact rows never
  * shuffle for the clamp, which is pure map work (the q85 gap-fill /
  * q94 sampling-rate-join pattern).
  */
object Robust {

  /** `df` with `valueCol` clamped into its per-`keyCol` binned
    * [lo, hi]-quantile band; the bounds ride along as `__plo`/`__phi`
    * for downstream summaries.
    *
    * The band is the smallest bin-aligned interval covering the central
    * mass: `__plo` is the LOWER edge of the first bin whose cumulative
    * count reaches `lo*N` (values inside the lo-quantile's own bin
    * survive), `__phi` the UPPER edge of the first bin reaching `hi*N`
    * (ditto on the high side) — so a group concentrated in one bin (a
    * constant column) clips nothing. Histogram bins are `bins`
    * equal-width slices of [binLo, binHi]; out-of-range values clamp to
    * the edge bins, so no row is ever dropped from the CDF.
    *
    * The bounds table is one row per distinct `keyCol` value, and the
    * join regime is a DECLARED contract, not a runtime probe — any
    * pre-job that counts the bounds pays a second action, and measured
    * at sf0.1 the per-action overhead alone (~0.25 s) doubles the
    * clamp (round 7 shipped exactly that: localCheckpoint + count at
    * 1.26 s vs 0.53 s without). So:
    *
    *  - `broadcastKeyLimit > 0` (default): the caller asserts the key
    *    cardinality is bounded; the bounds get the broadcast hint and
    *    fact rows never move for the clamp — the 100 TB shape for the
    *    common low-cardinality group column. The assertion is kept
    *    honest by an in-plan tripwire: a count over the groups-sized
    *    bounds rides the broadcast side and `raise_error`s LOUDLY —
    *    naming the fix — if the limit is exceeded, instead of silently
    *    OOM-ing the driver on an unbounded broadcast. No extra action,
    *    no fact-table work: the tripwire window sees only bounds rows.
    *  - `broadcastKeyLimit = 0`: high/unknown cardinality; no hint, and
    *    the clamp is left to AQE, which broadcasts small bounds at
    *    runtime and keeps genuinely huge ones as a shuffle join
    *    (measured within noise of the forced broadcast at sf0.1). */
  def winsorize(df: DataFrame, keyCol: String, valueCol: String,
      lo: Double, hi: Double,
      binLo: Double, binHi: Double, bins: Int = 4096,
      broadcastKeyLimit: Long = 1000000L): DataFrame = {
    require(lo > 0 && lo < hi && hi < 1, s"need 0 < lo < hi < 1: $lo, $hi")
    require(bins >= 1 && binHi > binLo,
      s"need binHi > binLo and bins >= 1: [$binLo, $binHi] x $bins")
    val width = (binHi - binLo) / bins
    val hist = df.select(col(keyCol),
        least(lit(bins - 1L), greatest(lit(0L),
          floor((col(valueCol).cast("double") - lit(binLo)) / lit(width))
            .cast("long"))).as("__bin"))
      .groupBy(col(keyCol), col("__bin")).agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // per-group N from a full-frame window over the same histogram —
    // one corpus scan, not a second aggregate over the input
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val bounds = hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .groupBy(col(keyCol))
      .agg(
        (lit(binLo) +
          min(when(col("__cum") >= lit(lo) * col("__n"), col("__bin"))) *
            lit(width)).as("__plo"),
        (lit(binLo) +
          (min(when(col("__cum") >= lit(hi) * col("__n"), col("__bin"))) +
            lit(1L)) * lit(width)).as("__phi"))
    val boundsKeyed =
      if (broadcastKeyLimit > 0) {
        // tripwire: counts only the groups-sized bounds (never fact
        // rows) and turns an over-limit broadcast into a loud,
        // actionable error instead of a silent OOM. The count rides a
        // single-partition window keyed by [[Windows.singlePartitionKey]]
        // (runtime-constant, non-foldable — so no WindowExec WARN). A
        // plain 1-row count join is NOT equivalent: the optimizer
        // prunes that branch straight past the histogram to a second
        // distinct-scan of the fact table (measured), where this
        // window sees only the groups-sized bounds. No second scan, no
        // extra action, single partition by construction.
        val wNk = Window.partitionBy(Windows.singlePartitionKey(col(keyCol)))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        broadcast(bounds
          .withColumn("__nk", count(lit(1)).over(wNk))
          .filter(when(col("__nk") <= lit(broadcastKeyLimit), lit(true))
            .otherwise(raise_error(format_string(
              "winsorize: %s distinct '" + keyCol + "' keys exceed " +
                s"broadcastKeyLimit=$broadcastKeyLimit; pass " +
                "broadcastKeyLimit = 0 to clamp through the shuffle " +
                "regime instead of a broadcast", col("__nk"))))
            .cast("boolean"))
          .drop("__nk"))
      } else bounds // unhinted: AQE broadcasts small, shuffles huge
    df.join(boundsKeyed, Seq(keyCol))
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
      lo: Double, hi: Double,
      binLo: Double, binHi: Double, bins: Int = 4096,
      scale: Long = 10000L, broadcastKeyLimit: Long = 1000000L): DataFrame = {
    val raw = col("__raw")
    winsorize(
        df.withColumn("__raw", col(valueCol)), keyCol, valueCol,
        lo, hi, binLo, binHi, bins, broadcastKeyLimit)
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

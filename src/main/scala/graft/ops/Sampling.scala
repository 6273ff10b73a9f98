package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture resampling: downsample a corpus so the per-key document
  * shares approach target mixture percentages — the data-mixture knob of
  * a pre-training pipeline (e.g. rebalance languages or sources before
  * tokenization).
  *
  * All arithmetic is integer-exact and the per-row keep decision is a
  * pure function of document content (the portable rolling-hash
  * fingerprint), so the sample is deterministic, engine-portable, and
  * stable under re-sharding — the properties a reproducible training
  * run needs. Reference analog: the deterministic rerun-safe selection
  * discipline of /root/reference scripts/01b_make_cog_all.R:84-89 (what
  * is processed must be a pure function of the input, never of run
  * order).
  *
  * Scale shape: per-key counts are one tiny partially-aggregated
  * shuffle; the rate table is a handful of rows and joins back as a
  * BROADCAST; the keep filter is map-side work on the fingerprint. The
  * corpus itself shuffles only for the final per-key summary.
  */
object Sampling {

  /** Per-key sampling summary toward `targetsPct` (percent, summing to
    * <= 100). For each key: desired_n = pct*N/100 (integer division),
    * keep rate = min(1, desired_n/n_bucket) applied as an integer
    * millionths threshold on fingerprint(text) % 1e6. Keys absent from
    * `targetsPct` are dropped (rate 0). Over-represented keys shrink
    * toward the target; under-represented ones are kept whole (no
    * upsampling). Returns (key, n_bucket, desired_n, n_sampled). */
  def mixtureResample(docs: DataFrame, keyCol: String,
      targetsPct: Seq[(String, Int)]): DataFrame = {
    require(targetsPct.nonEmpty && targetsPct.map(_._2).forall(p => p >= 0 && p <= 100),
      s"percent targets must be within 0..100: $targetsPct")
    require(targetsPct.map(_._2).sum <= 100,
      s"percent targets exceed 100: $targetsPct")
    val spark = docs.sparkSession
    import spark.implicits._
    val targets = targetsPct.toDF(keyCol, "pct")
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val rates = docs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_bucket"))
      .join(broadcast(targets), keyCol)
      .crossJoin(broadcast(nDocs))
      .select(col(keyCol), col("n_bucket"),
        expr("(pct * n_total) div 100").as("desired_n"))
      .select(col(keyCol), col("n_bucket"), col("desired_n"),
        least(lit(1000000L), expr("(desired_n * 1000000) div n_bucket"))
          .as("thresh"))
    docs.join(broadcast(rates), keyCol)
      .select(col(keyCol), col("n_bucket"), col("desired_n"),
        (pmod(TextAnalysis.fingerprint(col("text")), lit(1000000L)) <
          col("thresh")).cast("long").as("kept"))
      .groupBy(col(keyCol), col("n_bucket"), col("desired_n"))
      .agg(sum(col("kept")).as("n_sampled"))
  }

  /** Per-key document cap (the Common-Crawl-style per-domain quota): keep
    * at most `cap` docs per key, chosen deterministically as the lowest
    * `idCol` values — a reproducible quota, not a random sample, so reruns
    * and engines agree row-for-row.
    *
    * Scale shape: one shuffle on the key plus a per-key incremental
    * row_number — Spark sorts within each key partition but keeps only the
    * running counter, no global sort. A pathological mega-key serializes
    * its own partition's scan; when such keys are known, pre-filtering
    * them by a count pass (broadcast of over-cap keys) bounds the window
    * input to `cap`-ish rows per key. That pre-pass is exactly
    * [[mixtureResample]]'s rate table with a fixed target, so the
    * composition is available where skew demands it. */
  def perKeyCap(docs: DataFrame, keyCol: String, cap: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .drop("rn")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: per
    * key, pick ~`k` documents with inclusion probability proportional to
    * `weightCol` (the classic Madow systematic design — sample an eval
    * set proportional to token mass, not uniformly). A document is
    * picked iff its weight interval (cum-w, cum] in the id-ordered
    * cumulative-weight line crosses a multiple of W/k; the crossing
    * test is pure integer arithmetic — `(cum*k) div W` strictly grows —
    * so the selection is deterministic, engine-portable, and
    * reproducible run-to-run (no RNG anywhere; the "random start" of
    * textbook systematic sampling is fixed at 0, which trades the
    * design-unbiasedness a survey statistician wants for the exact
    * reproducibility a training pipeline wants). A row heavier than W/k
    * crosses several strides: it is emitted once with `n_picks` > 1,
    * keeping the Horvitz-Thompson accounting exact.
    *
    * Scale shape: the naive per-key running sum is one reducer per key
    * (dead for a hot key), so the cumulative line decomposes exactly as
    * [[tokenBudgetSelect]]'s histogram does — per (key, id-range bin)
    * totals (one partially-aggregated shuffle emitting bin rows), bin
    * offsets via a window over the bin table, then an intra-bin running
    * sum — parallelism per bin, and `off + intra` equals the naive
    * running sum row-for-row, which is exactly what the oracle replays
    * with a single window. Caller contract: `sum(w) * k` per key must
    * fit in a Long (at 1e14 total weight that allows k up to ~9e4; shard
    * the key space first if you need more). Negative weights are clamped
    * to 0 (a negative interval would break the monotone cumulative line
    * and the picks-telescope-to-k invariant); zero-weight rows — and
    * whole keys whose total weight is 0, where inclusion probability is
    * undefined — are never picked and drop out of the output. */
  def ppsSample(docs: DataFrame, keyCol: String, weightCol: String, k: Int,
      idCol: String = "doc_id", binSize: Long = 64L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(binSize >= 1, s"binSize must be >= 1: $binSize")
    val W = org.apache.spark.sql.expressions.Window
    // integer `div` for the bin: double division drifts off the
    // documented floor(id/binSize) grid for ids above 2^53
    val rows = docs.select(col(keyCol), col(idCol),
        greatest(col(weightCol).cast("long"), lit(0L)).as("__w"))
      .withColumn("__bin",
        expr(s"CAST($idCol AS BIGINT) div $binSize"))
    val bins = rows.groupBy(col(keyCol), col("__bin"))
      .agg(sum(col("__w")).as("__bin_w"))
    val wPrev = W.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(W.unboundedPreceding, -1)
    val wAll = W.partitionBy(col(keyCol))
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val offsets = bins
      .withColumn("__off", coalesce(sum(col("__bin_w")).over(wPrev), lit(0L)))
      .withColumn("__tot", sum(col("__bin_w")).over(wAll))
      .select(col(keyCol), col("__bin"), col("__off"), col("__tot"))
    val wIn = W.partitionBy(col(keyCol), col("__bin")).orderBy(col(idCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    rows.join(offsets, Seq(keyCol, "__bin"))
      .withColumn("cum", col("__off") + sum(col("__w")).over(wIn))
      .withColumn("__picks",
        expr(s"(cum * $k) div __tot - ((cum - __w) * $k) div __tot"))
      .filter(col("__picks") > 0)
      .select(col(keyCol), col(idCol), col("__w").as("w"), col("cum"),
        col("__picks").as("n_picks"))
  }

  /** Token-budget curation: per key, keep documents in priority order
    * (priority desc, id asc as the tiebreak) while the running token
    * total stays within `budget` — "fill the training mix from the best
    * documents first", the selection step between quality scoring and
    * tokenization.
    *
    * Scale shape: the naive formulation is a running sum over a per-key
    * TOTAL order — one reducer per key, dead at 100 TB. Because the
    * priority is integer-valued, the order decomposes exactly (the
    * [[Robust.winsorize]] histogram discipline): (1) a per
    * (key, priority) histogram of token mass — one partially-aggregated
    * shuffle emitting BIN rows, not document rows; (2) per key, running
    * bin totals in priority-descending order give each bin its starting
    * offset — a window over the bin table, bin-cardinality-sized;
    * (3) bins whose offset already exceeds the budget are eliminated
    * BEFORE any document shuffles (the inner join doubles as the
    * semi-join); surviving rows pay only a per-(key, priority) window —
    * parallelism per bin rather than per key, so a hot key no longer
    * serializes. `cum_tok = bin offset + intra-bin running sum` equals
    * the naive global running sum row-for-row, which is exactly what
    * the oracle replays with the single-window formulation. */
  def tokenBudgetSelect(docs: DataFrame, keyCol: String, priorityCol: String,
      tokCol: String, budget: Long, idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val W = org.apache.spark.sql.expressions.Window
    val rows = docs.select(col(keyCol),
      col(priorityCol).cast("long").as("__pri"), col(idCol),
      col(tokCol).cast("long").as("__tok"))
    val bins = rows.groupBy(col(keyCol), col("__pri"))
      .agg(sum(col("__tok")).as("__bin_tok"))
    val wBins = W.partitionBy(col(keyCol)).orderBy(col("__pri").desc)
      .rowsBetween(W.unboundedPreceding, -1)
    val offsets = bins
      .withColumn("__off", coalesce(sum(col("__bin_tok")).over(wBins), lit(0L)))
      .filter(col("__off") < budget)
      .select(col(keyCol), col("__pri"), col("__off"))
    val wIn = W.partitionBy(col(keyCol), col("__pri")).orderBy(col(idCol))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    rows.join(offsets, Seq(keyCol, "__pri"))
      .withColumn("cum_tok", col("__off") + sum(col("__tok")).over(wIn))
      .filter(col("cum_tok") <= budget)
      .select(col(keyCol), col(idCol), col("__pri").as("priority"),
        col("__tok").as("tok"), col("cum_tok"))
  }
}

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
}

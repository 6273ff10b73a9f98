package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the production COMPOSITION of the
  * library's dedup/quality/quota stages in their scale-correct order:
  *
  *   1. exact dedup FIRST (md5 collapse, one shuffle) — duplicates must
  *      not spend quality-scoring or quota budget;
  *   2. per-row quality gate (token count + alphabetic ratio, zero
  *      shuffle, runs on the already-thinned corpus);
  *   3. per-source quota cap LAST (one keyed window shuffle over the
  *      survivors only).
  *
  * Each stage's input is strictly smaller than the previous stage's, so
  * at 100 TB the expensive keyed stages run on monotonically shrinking
  * data; reordering (cap before dedup, say) would let duplicate docs
  * consume their source's quota. Every decision is a pure function of
  * document content and id — reruns and engines agree row-for-row.
  */
object Pipeline {

  /** Curated corpus: (doc_id, source, n_tokens) of every surviving doc.
    * A doc survives iff it is its md5-group's lowest doc_id, has at least
    * `minTokens` whitespace tokens and alphabetic ratio >= `minAlpha`
    * (identical IEEE expression on both engines — no rounding before the
    * comparison), and falls within its source's first `perSourceCap`
    * surviving doc_ids. */
  def curate(
      docs: DataFrame,
      minTokens: Long = 30L,
      minAlpha: Double = 0.78,
      perSourceCap: Int = 15,
      textCol: String = "text"): DataFrame = {
    val keepers = docs
      .groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = docs.join(keepers, Seq("doc_id"), "left_semi")
    val gated = deduped
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
        TextAnalysis.alphaRatio(col(textCol)).as("ar"))
      .filter(col("n_tokens") >= minTokens && col("ar") >= minAlpha)
      .drop("ar")
    Sampling.perKeyCap(gated, "source", perSourceCap)
  }
}

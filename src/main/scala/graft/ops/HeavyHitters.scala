package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-token mining at corpus scale: a per-partition
  * Misra-Gries sketch prunes the candidate space, then one exact count
  * over the (tiny) candidate set confirms true heavy hitters.
  *
  * Why two passes: a plain `groupBy(token).count()` shuffles one row per
  * DISTINCT token — at 100 TB that is a vocabulary-sized shuffle dominated
  * by the long tail of hapax tokens that can never reach the frequency
  * threshold. Misra-Gries with capacity ceil(1/minFreq) guarantees that
  * any token with global frequency > minFreq survives the sketch in at
  * least one partition (pigeonhole: a global share above the threshold
  * implies an above-threshold local share somewhere), so the union of
  * per-partition candidates is a SUPERSET of the true heavy hitters —
  * typically a few hundred tokens. The exact recount is a broadcast
  * semi-join + groupBy over that superset only, so the shuffle carries
  * candidate tokens instead of the whole vocabulary. False candidates are
  * eliminated by the exact count; the result is exact and deterministic
  * regardless of partitioning (the sketch only affects which non-answers
  * get discarded early).
  *
  * Reference analog: token-frequency pruning in training-data quality
  * pipelines; same skeleton as lossy counting / Space-Saving candidate
  * generation (Misra & Gries 1982, public algorithm).
  */
object HeavyHitters {

  /** Tokens whose corpus-wide occurrence share exceeds `minFreq`,
    * with their exact counts. Output: (token, cnt), ordered by count
    * desc then token. */
  def heavyHitterTokens(
      docs: DataFrame,
      minFreq: Double,
      textCol: String = "text"): DataFrame = {
    require(minFreq > 0 && minFreq < 1, s"minFreq must be in (0,1): $minFreq")
    val spark = docs.sparkSession
    import spark.implicits._
    val capacity = math.ceil(1.0 / minFreq).toInt
    val toks = docs.select(explode(TextAnalysis.tokens(col(textCol)))
      .as("token")).filter(col("token") =!= "")

    // pass 1: per-partition Misra-Gries — k counters, decrement-all on
    // overflow. Emits surviving keys only; counts are NOT trusted.
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1L
        else if (counters.size < capacity) counters(t) = 1L
        else {
          // decrement all; drop zeros (amortized O(1) per input token)
          val dead = List.newBuilder[String]
          counters.keysIterator.foreach { k =>
            val c = counters(k) - 1L
            if (c == 0L) dead += k else counters(k) = c
          }
          dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("token").dropDuplicates("token")

    // pass 2: exact recount restricted to candidates. The candidate set
    // is bounded by capacity * numPartitions — broadcastable for any sane
    // minFreq, but a tiny minFreq (1e-6 at 1000 partitions = 10^9 keys)
    // would blow past the broadcast threshold, so fall back to a shuffle
    // semi-join when the bound is large. The result is identical either
    // way; only the join strategy changes.
    val candidateBound = capacity.toLong * toks.rdd.getNumPartitions
    val prunedCandidates =
      if (candidateBound <= 1000000L) broadcast(candidates) else candidates
    val total = toks.groupBy().agg(count(lit(1)).as("n_total"))
    toks.join(prunedCandidates, Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") > col("n_total") * minFreq)
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Plain exact formulation (full-vocabulary shuffle) — the semantics
    * twin used by specs to pin the sketched path's output. */
  private[graft] def heavyHitterTokensExact(
      docs: DataFrame,
      minFreq: Double,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(explode(TextAnalysis.tokens(col(textCol)))
      .as("token")).filter(col("token") =!= "")
    val total = toks.groupBy().agg(count(lit(1)).as("n_total"))
    toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") > col("n_total") * minFreq)
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }
}

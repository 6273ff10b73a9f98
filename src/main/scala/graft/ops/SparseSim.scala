package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse (bag-of-n-grams) cosine similarity via posting-list joins —
  * the weighted complement of [[Dedup.ngramJaccardPairs]]'s set
  * semantics and of [[Similarity]]'s dense-embedding cosine.
  *
  * The document becomes a sparse integer vector over hashed n-grams
  * (term frequency, duplicates KEPT — that is what distinguishes cosine
  * from Jaccard here). Pair dot products come from the classic inverted
  * index: self-join the (doc, gram, tf) postings on the gram, sum
  * tf_a*tf_b per pair. The candidate blowup is sum(df^2) over grams, so
  * the document-frequency cap is THE scale lever: a gram appearing in
  * more than `maxDf` documents is dropped from the vector space (a
  * corpus-wide stop-gram — it carries no near-dup signal but
  * contributes df^2 join rows). Everything stays integer-exact until
  * the single final division, so the scores are bit-identical across
  * engines (no rounding in the oracle compare).
  */
object SparseSim {

  /** All document pairs with n-gram-cosine >= `threshold`. Output:
    * doc_a < doc_b, the integer dot product, and the cosine. One gram
    * shuffle for tf, one for the df-cap semi-join, one shuffle to
    * assemble posting lists (pairs explode in-memory under the df cap),
    * one pair aggregation — never an all-pairs product.
    *
    * The CAPPED posting list feeds three subtrees (pair generation,
    * both norm lookups), and Spark reuses none of them — so with
    * `eager = true` (default) it is cached, a job runs AT CALL TIME to
    * materialize the bounded pair result via `localCheckpoint(true)`,
    * and the corpus-sized cache is released before returning (the
    * [[Dedup]] discipline: the corpus tokenizes ONCE instead of three
    * times, and nothing persists past the call). `eager = false` keeps
    * the plan inspectable. At warehouse scale the capped posting list
    * is the thing to materialize as a table. */
  def ngramCosinePairs(
      docs: DataFrame, n: Int = 3, threshold: Double = 0.5,
      maxDf: Long = 1000, textCol: String = "text",
      eager: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    require(maxDf > 1, s"maxDf must exceed 1 or no pair survives: $maxDf")
    val tf = docs
      .select(col("doc_id"), explode(filter(
        TextAnalysis.positionalHashedNgrams(col(textCol), n),
        g => g.isNotNull)).as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, gram), so counting rows per gram IS the
    // document frequency. A count-over-window partitioned by gram (the
    // [[Dedup.minHashCandidatePairs]] stop-bucket pattern) computes df
    // and applies the cap in ONE shuffle of the posting list — the
    // groupBy(df)+semi-join shape this replaces shuffled tf by the same
    // key twice (and made tf the thing to cache; with one consumer the
    // cache belongs on the CAPPED postings below, which feed three
    // subtrees). Identical survivors: both count rows per gram.
    val pruned0 = tf
      .withColumn("__df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("gram"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")
    val pruned = if (eager)
      pruned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else pruned0
    val norms = pruned.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("ss"))
    // Pair generation per posting list, not a posting self-join: the df
    // cap bounds every list at maxDf entries, so the <= df(df-1)/2
    // ordered pairs are generated in-memory with HOFs after ONE shuffle
    // to the gram — where the self-join shape sorts the posting list
    // twice for the merge join and shuffles it twice. Integer products
    // commute, so the per-pair dot is bit-identical either way.
    val dots = pruned
      .groupBy(col("gram"))
      .agg(collect_list(struct(col("doc_id"), col("tf"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), x =>
        transform(filter(col("ps"), y => y("doc_id") > x("doc_id")), y =>
          struct(x("doc_id").as("doc_a"), y("doc_id").as("doc_b"),
            (x("tf") * y("tf")).as("p")))))).as("pr"))
      .groupBy(col("pr.doc_a").as("doc_a"), col("pr.doc_b").as("doc_b"))
      .agg(sum(col("pr.p")).as("dot"))
    val out = dots
      .join(norms.select(col("doc_id").as("doc_a"), col("ss").as("ssa")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("ss").as("ssb")), "doc_b")
      .withColumn("cosine", col("dot").cast("double") /
        (sqrt(col("ssa").cast("double")) * sqrt(col("ssb").cast("double"))))
      .filter(col("cosine") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("dot"), col("cosine"))
    if (!eager) out
    else {
      val o = out.localCheckpoint(eager = true)
      pruned.unpersist()
      o
    }
  }
}

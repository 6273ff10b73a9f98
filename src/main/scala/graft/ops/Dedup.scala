package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale design (100 TB intent):
  *  - exact dedup is a hash-groupBy: one shuffle on a 128-bit digest, with
  *    map-side partial aggregation;
  *  - MinHash-LSH and SimHash banding turn the O(n^2) all-pairs problem into
  *    an equi-join on band buckets (shuffle on bucket key, skew-resistant
  *    because bands distribute hot shingles across `numBands` keys);
  *  - exact n-gram Jaccard is reserved for candidate verification or
  *    bounded partitions (e.g. per-source), never the full corpus.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5(text): digest, group size, and the
    * smallest doc_id as the canonical keeper. */
  def exactDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))

  /** MinHash signature over a shingle array: element i is the minimum of
    * hash_i over the shingles.
    *
    * Shaped as ONE fold over the shingles (not `transform(seeds, seed ->
    * min over grams)`): Catalyst inlines the grams expression into lambda
    * bodies, and a per-seed lambda would re-evaluate the whole shingling
    * numHashes times per row — a measured ~60x slowdown at sf0.1. In the
    * fold, each shingle is string-hashed once and then remixed per seed
    * with cheap long hashing. Empty shingle sets yield Long.MaxValue
    * sentinels (callers filter empty docs). */
  def minHashSignature(grams: Column, numHashes: Int): Column = {
    val ghash = transform(grams, g => xxhash64(g))
    val init = transform(sequence(lit(0), lit(numHashes - 1)),
      _ => lit(Long.MaxValue))
    aggregate(ghash, init,
      (acc, x) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (a, s) => least(a, xxhash64(s, x))))
  }

  /** MinHash-LSH candidate pairs: signatures are cut into `numBands` bands
    * of `numHashes/numBands` rows; docs sharing any band bucket become a
    * candidate pair, scored by signature agreement (estimated Jaccard).
    *
    * Output: doc_a < doc_b, est_jaccard in [0,1].
    */
  def minHashCandidatePairs(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 3,
      numHashes: Int = 64,
      numBands: Int = 16,
      minEstJaccard: Double = 0.5,
      maxBucketSize: Int = 50): DataFrame = {
    val rows = numHashes / numBands
    val sigs = docs
      .select(col("doc_id"),
        TextAnalysis.hashedNgrams(col(textCol), n).as("grams"))
      .filter(size(col("grams")) > 0) // MaxValue sentinel sigs never pair
      .select(col("doc_id"), minHashSignature(col("grams"), numHashes).as("sig"))
    val banded = sigs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(numBands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, slice(col("sig"), b * lit(rows) + lit(1), lit(rows)))
            .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Skew guard: oversized buckets come from degenerate/boilerplate
    // shingles; scoring their quadratic pair blow-up is both useless and
    // the classic LSH hot-key failure at scale. Drop them.
    val sized = banded
      .withColumn("bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= maxBucketSize)
    val a = sized.as("a"); val b = sized.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"))
      // dedup (a doc pair can share several bands) BEFORE the O(numHashes)
      // agreement scoring
      .dropDuplicates("doc_a", "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
          x => x)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** 64-bit SimHash rendered as a 64-char bit string (MSB first).
    * Implemented with bin()/string bits to stay in pure codegen'd
    * expressions (no per-bit shift loops). */
  def simHashBits(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), w => xxhash64(w))
    val zeros = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val bitOf = (h: Column) =>
      transform(split(lpad(bin(h), 64, "0"), ""),
        c => when(c === "1", lit(1L)).otherwise(lit(-1L)))
    val counts = aggregate(hashes, zeros,
      (acc, h) => zip_with(acc, bitOf(h), (a, x) => a + x))
    concat_ws("", transform(counts, c => when(c > 0, lit("1")).otherwise(lit("0"))))
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingBits(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
      x => x))

  /** SimHash near-duplicate candidates: band the 64-bit string into 4
    * 16-bit prefixes; docs sharing any band join, then exact Hamming
    * distance filters to <= maxHamming. */
  def simHashCandidatePairs(
      docs: DataFrame,
      textCol: String = "text",
      maxHamming: Int = 8): DataFrame = {
    val sh = docs.select(col("doc_id"), simHashBits(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"),
          col("sh").substr(b * lit(16) + lit(1), lit(16)).as("bucket")))).as("bb"))
      .select(col("doc_id"), col("sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_a", "doc_b") // before the O(64) hamming scoring
      .select(col("doc_a"), col("doc_b"),
        hammingBits(col("sha"), col("shb")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact word-n-gram Jaccard similarity over pairs sharing
    * `partitionCol` (bounds the quadratic blow-up; the join shuffles both
    * sides on that key so pairs form within co-located partitions). */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.05,
      partitionCol: String = "source"): DataFrame = {
    // persist: the self-join would otherwise recompute the per-char
    // hashing for BOTH sides (no common-subplan reuse without it)
    val grams = docs.select(col("doc_id"), col(partitionCol),
      TextAnalysis.hashedNgrams(col(textCol), n).as("grams"))
      .withColumn("gsz", size(col("grams")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = grams.as("a"); val b = grams.as("b")
    a.join(b,
        col(s"a.$partitionCol") === col(s"b.$partitionCol") &&
        col("a.doc_id") < col("b.doc_id") &&
        // size-ratio prune: jaccard(A,B) <= min/max of |A|,|B|, so pairs
        // outside the ratio can never reach `threshold` — skip their
        // O(|A|+|B|) intersect without changing results
        col("a.gsz").cast("double") >= col("b.gsz") * threshold &&
        col("b.gsz").cast("double") >= col("a.gsz") * threshold)
      // materialize the intersect size ONCE (naive |A∩B|/|A∪B| evaluates
      // the intersect twice per pair)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.grams"), col("b.grams")))
          .cast("double").as("inter"),
        (col("a.gsz") + col("b.gsz")).as("tot"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / (col("tot") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

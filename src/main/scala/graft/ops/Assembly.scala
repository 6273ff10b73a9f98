package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Training-run assembly — the last mile from a curated corpus to the
  * artifact a training job actually consumes: a deterministically
  * shuffled, leakage-safely split, token-budget-sharded dataset with a
  * verifiable manifest. (The reference stops at publishing curated
  * rasters + metadata; an LLM-data pipeline additionally has to hand the
  * corpus to a trainer, and these three properties — reproducible order,
  * no near-dup straddling train/eval, bounded shard sizes — are the
  * contract that step has to meet.)
  *
  * Everything is keyed on the engine-portable avalanche hash
  * ([[Sketches.portableHash]]), so each assignment is (a) deterministic
  * given (ids, seed) — two runs, or two engines, produce the same
  * shuffle order, splits, and shards — and (b) SQL-expressible, so the
  * DuckDB oracle replays the exact assignment, not a statistical
  * neighborhood of it.
  *
  * Scale shape: no stage concentrates the data. The global shuffle order
  * is a range-repartition + within-partition sort (no single-partition
  * window anywhere — see [[Ids]]); the cumulative token sum that drives
  * sharding is the classic two-phase scan (per-partition subtotals, a
  * #partitions-row prefix sum, broadcast offsets back); the split
  * assignment is one hash per cluster representative.
  */
object Assembly {

  /** Modulus of the portable hash family — mirrored verbatim in every
    * oracle (same literal as the suites' SQL replays). */
  private val P = 1000000007L

  private def shuffleHash(id: Column, seed: Long): Column =
    Sketches.portableHash(id + lit(seed))

  /** Deterministic global shuffle: original columns plus `shuffle_pos` =
    * the row's 0-based rank by (portableHash(id + seed), id). Changing
    * the seed permutes the corpus; keeping it reproduces the exact
    * training order byte-for-byte — the property that makes a training
    * run resumable and a data ablation comparable.
    *
    * Positions come from [[Ids.assignIds]] (range repartition + count-
    * and-offset), so the "global sort" never lands on one task.
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: Long): DataFrame = {
    require(!df.columns.contains("shuffle_pos"),
      "input already has a shuffle_pos column")
    require(!df.columns.contains("id") && idCol != "id",
      "deterministicShuffle reserves the column name 'id' (Ids.assignIds)")
    val h = "__shuffle_h"
    Ids.assignIds(
        df.withColumn(h, shuffleHash(col(idCol), seed)), Seq(h, idCol))
      .withColumnRenamed("id", "shuffle_pos")
      .drop(h)
  }

  /** Cumulative-fraction hash cutoffs in [0, P): a row whose hash lands
    * below `cutoffs(i)` and at/above `cutoffs(i-1)` takes split i. Long
    * literals (not floats) so the Spark plan and the oracle SQL compare
    * integers — no float-boundary drift between engines. */
  private[graft] def splitCutoffs(
      fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    fractions.map(_._1).zip(cum.map(f => math.round(f * P)))
  }

  /** Leakage-safe train/val/test split: the unit of assignment is the
    * NEAR-DUP CLUSTER, not the document. Every member of a
    * [[Dedup.duplicateClusters]] cluster shares its representative
    * (the cluster's canonical min doc_id; unclustered docs represent
    * themselves), and the split is a pure hash of that representative —
    * so two near-identical documents can never land one in train and one
    * in eval, the leak a per-doc hash split (q49) cannot rule out.
    *
    * Output: (doc_id, cluster_rep, split). The cluster join ships only
    * (doc_id, cluster_id) pairs for CLUSTERED docs — at real dup rates a
    * small fraction of the corpus — and the assignment itself is one
    * hash + one when-chain, map-side.
    */
  def leakageSafeSplit(docs: DataFrame, textCol: String = "text",
      seed: Long = 0L,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      minEstJaccard: Double = 0.5): DataFrame = {
    val cuts = splitCutoffs(fractions)
    val clusters = Dedup.duplicateClusters(docs, textCol, minEstJaccard)
      .select(col("doc_id"), col("cluster_id"))
    val h = shuffleHash(col("cluster_rep"), seed)
    val splitExpr = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), rest) => when(col("__h") < lit(cut), name)
        .otherwise(rest)
    }
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("__h", h)
      .select(col("doc_id"), col("cluster_rep"), splitExpr.as("split"))
  }

  /** Token-budget sharding: rows ordered by the deterministic shuffle
    * hash are cut into contiguous shards of ~`budget` tokens —
    * `shard_id = (starting token offset) div budget`, so every shard
    * except possibly the last spans at most `budget` tokens plus its one
    * boundary-straddling document. This is the "write N roughly-equal
    * training files" step, with the shard boundary a pure function of
    * (ids, token counts, seed) — reproducible and oracle-replayable.
    *
    * The exact global running sum is the [[Ids.assignIds]] shape: ONE
    * range-repartition shuffle, then two jobs over the SAME shuffled RDD
    * (shuffle files are reused) — per-partition token subtotals (a
    * #partitions-long collect), prefix-summed into broadcast offsets,
    * then a per-partition running sum. A declarative
    * `Window.partitionBy(partition_id)` would plan a SECOND full-data
    * hash exchange on top of the range shuffle; the imperative pass
    * keeps the data moving exactly once. Offsets come from the actual
    * partition contents, so the result is independent of where the
    * sampled range boundaries land.
    */
  def tokenBudgetShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, seed: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("shard_id"),
      "input already has a shard_id column")
    val spark = df.sparkSession
    val parted = df
      .withColumn("__h", shuffleHash(col(idCol), seed))
      .withColumn("__tok", col(tokensCol).cast("long"))
      .repartitionByRange(col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
    val tokIdx = parted.schema.fieldIndex("__tok")
    val partedRdd = parted.rdd
    // job 1: per-partition subtotals — the collect is #partitions longs
    val subtotals = partedRdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(s += _.getLong(tokIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(
      subtotals.scanLeft(0L)(_ + _))
    // job 2 (reuses job 1's shuffle output): running sum from the
    // partition's offset; shard = starting-offset div budget, exact
    // integer arithmetic (a double floor would wobble past 2^53 tokens)
    val schema = StructType(parted.schema.fields :+
      StructField("shard_id", LongType, nullable = false))
    val rows = partedRdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets.value(i)
      it.map { r =>
        val start = cum
        cum += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ start / budget)
      }
    }
    spark.createDataFrame(rows, schema).drop("__h", "__tok")
  }

  /** Per-shard manifest: (shard_id, n_docs, n_tokens, checksum) with an
    * order-independent xor-of-portable-hashes membership checksum (the
    * [[Checksum]] idea, xor instead of sum so it can never overflow).
    * One map-side-combinable aggregate; verify a delivered shard by
    * recomputing its row from the shard's file alone. */
  def shardManifest(sharded: DataFrame, idCol: String,
      tokensCol: String): DataFrame =
    sharded
      .select(col("shard_id"),
        Sketches.portableHash(col(idCol)).as("__hid"),
        col(tokensCol).cast("long").as("__tok"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        expr("bit_xor(__hid)").as("checksum"))

  /** Materialize the shards: parquet partitioned by `shard_id` under
    * `outDir/shards/` plus the manifest at `outDir/manifest/`, both
    * through whatever filesystem the URI's scheme resolves to (local,
    * hdfs://, s3a://). Readers get directory-pruned access to any shard
    * subset; the returned manifest is what was written. */
  def writeShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, seed: Long, outDir: String): DataFrame = {
    val sharded = tokenBudgetShards(df, idCol, tokensCol, budget, seed)
    sharded.write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$outDir/shards")
    val manifest = shardManifest(sharded, idCol, tokensCol)
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    df.sparkSession.read.parquet(s"$outDir/manifest")
  }
}

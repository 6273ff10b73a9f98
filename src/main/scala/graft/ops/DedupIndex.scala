package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Disk-backed MinHash-LSH dedup index — the near-dup twin of
  * [[VectorStore]]: per-document MinHash signatures and band-bucket
  * postings persisted as a QUERYABLE TABLE LAYOUT, so the nightly ingest
  * dedups a new batch against the whole corpus WITHOUT EVER RESCANNING
  * THE CORPUS TEXT.
  *
  * Why this exists: [[Dedup.incrementalNearDups]] already avoids the
  * quadratic all-pairs rerun, but it still reads and re-shingles the full
  * corpus text every night — at 100 TB that scan IS the cost. The index
  * stores what the join actually needs: 16-byte posting rows
  * (bucket, doc_id) and one 64-long signature per document — about
  * three orders of magnitude smaller than the text — written once per
  * batch and never rewritten. A nightly batch then computes ONLY its own
  * signatures and joins the stored postings.
  *
  * Layout under `dir`:
  *   params/            1-row parquet (n, num_hashes, num_bands,
  *                      bucket_shards) — the signature family is FROZEN
  *                      at write time; every later batch must band
  *                      identically or buckets would never collide.
  *   postings/batch=<b>/bbp=<s>/  (bb, doc_id) — bb packs (band, bucket)
  *                      as `band * P + bucket`; bbp = bb mod
  *                      bucket_shards is a real PARTITION COLUMN, so a
  *                      query for a batch's buckets prunes at the
  *                      DIRECTORY level (PartitionFilters — the
  *                      [[VectorStore]] probed-cells discipline).
  *   sigs/batch=<b>/idp=<s>/      (doc_id, sig) — signatures partitioned
  *                      by doc_id mod bucket_shards, so the verify join
  *                      back prunes to the candidates' shards.
  *   _folded            [[compact]]'s marker: `<foldId> <coveredUpTo> #`
  *                      — fold batches (ids >= [[FoldBase]]) hold the
  *                      folded content of every batch <= coveredUpTo
  *                      and are invisible until this marker names them.
  *   pairs/batch=<b>/   [[ingestStream]]'s pair log — one idempotent
  *                      directory per micro-batch.
  *   _stream_checkpoint [[ingestStream]]'s default checkpoint.
  *
  * Ingest idempotence is COMMIT-based, exactly as the vector store's: a
  * batch id counts as committed only when BOTH its postings and sigs
  * directories carry the parquet job-commit `_SUCCESS` marker; a crashed
  * half-write is invisible to queries and the replay overwrites it.
  * [[ingest]] scores the batch against the batches committed BEFORE it —
  * so a replayed ingest with an explicit batch id returns the SAME pairs
  * as the original run and re-lands the same files (mode overwrite):
  * fully idempotent. Default-allocated ids take max(committed)+1;
  * concurrent default-id ingests need external serialization (explicit
  * ids — the stream discipline — do not).
  *
  * Candidate semantics (all replayed by the DuckDB oracle):
  *   - batch docs pair only with INDEXED docs (batch-internal pairs are
  *     never generated — run [[Dedup.minHashCandidatePairs]] inside the
  *     batch if those are wanted; strictly the [[Dedup.incrementalNearDups]]
  *     contract);
  *   - a (band, bucket) whose STORED posting count exceeds
  *     `maxBucketSize` is a stop-bucket and generates nothing (the LSH
  *     hot-key guard, corpus-side counts — degenerate boilerplate
  *     buckets at corpus scale are exactly the keys that would melt one
  *     reducer);
  *   - surviving candidates are scored by signature agreement
  *     (est_jaccard = matching positions / num_hashes) and filtered at
  *     `minEstJaccard`.
  *
  * Scan economics at 100 TB: the postings scan is pruned to the shards
  * the batch's buckets actually touch (a small batch reads a few of the
  * `bucket_shards` directories per committed batch), the signature scan
  * is pruned to the candidates' shards, and the corpus TEXT is never
  * read at all. Every join is a keyed equi-join on bb / doc_id — nothing
  * quadratic, no broadcast of anything corpus-sized.
  *
  * FILESYSTEM CONTRACT: control-plane touches (commit probes, batch
  * listing, the params read) resolve the Hadoop [[FileSystem]] from the
  * index path's own scheme — `hdfs://`, `file://`, any registered
  * scheme — like the vector store and the WRI stages.
  */
object DedupIndex {

  private val P = 1000000007L

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    graft.wri.WriFs.fs(path, spark.sparkContext.hadoopConfiguration)

  private def postingsRoot(dir: String) = s"$dir/postings"
  private def sigsRoot(dir: String) = s"$dir/sigs"

  private def batchCommitted(fs: FileSystem, dir: String, id: Long): Boolean =
    fs.exists(new Path(s"${postingsRoot(dir)}/batch=$id/_SUCCESS")) &&
      fs.exists(new Path(s"${sigsRoot(dir)}/batch=$id/_SUCCESS"))

  /** A committed batch written from an empty frame holds only its
    * `_SUCCESS` marker — no part files, nothing to scan (and nothing
    * Spark could infer a schema from). */
  private def hasData(fs: FileSystem, path: String): Boolean = {
    val p = new Path(path)
    // metadata-only children (_SUCCESS, .crc sidecars on the raw local
    // filesystem) don't count — only real partition dirs / part files do
    fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Committed batch ids: both components' `_SUCCESS` present. */
  private def committedBatches(fs: FileSystem, dir: String): Seq[Long] = {
    val root = new Path(postingsRoot(dir))
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .filter(batchCommitted(fs, dir, _))
      .sorted
  }

  /** Stream micro-batch ids map to `StreamBatchBase + id`; batch-mode
    * ingests allocate below the base — the pools can never collide
    * (the [[VectorStore]] discipline). */
  val StreamBatchBase = 1000000L

  /** Fold batches ([[compact]]'s output) live ABOVE every normal and
    * stream id: a staged fold is invisible until the `_folded` marker
    * references it, and `id < beforeBatchId` replay filtering never
    * applies to folds (a fold only ever covers ids <= its marker's
    * coveredUpTo, which is below any replayable id). */
  val FoldBase = 2000000000L

  /** (foldId, coveredUpTo) from the `_folded` marker: fold `foldId`
    * holds the folded content of every batch with id <= coveredUpTo.
    * The marker is one small file written LAST — its write IS the
    * fold's commit. */
  private def foldInfo(fs: FileSystem, dir: String): Option[(Long, Long)] = {
    val p = new Path(s"$dir/_folded")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(0L, bytes)
      new String(bytes, "UTF-8").trim
    } finally in.close()
    text.split(" ").toSeq match {
      case Seq(f, c, "#") => Some((f.toLong, c.toLong))
      case _ => throw new IllegalStateException(
        s"$dir/_folded is torn or malformed: '$text'")
    }
  }

  /** The SERVING batch set: with no fold, every committed non-fold
    * batch (a staged, unreferenced fold is invisible); with a fold,
    * the fold itself plus every batch committed after its coverage. */
  private def activeBatches(fs: FileSystem, dir: String): Seq[Long] = {
    val committed = committedBatches(fs, dir)
    foldInfo(fs, dir) match {
      case None => committed.filter(_ < FoldBase)
      case Some((f, c)) =>
        committed.filter(b => b == f || (b < FoldBase && b > c))
    }
  }

  /** Frozen signature-family parameters, written once by [[write]]. */
  final case class Params(n: Int, numHashes: Int, numBands: Int,
      bucketShards: Int)

  private def readParams(spark: SparkSession, dir: String): Params = {
    val r = spark.read.parquet(s"$dir/params").head()
    Params(r.getAs[Int]("n"), r.getAs[Int]("num_hashes"),
      r.getAs[Int]("num_bands"), r.getAs[Int]("bucket_shards"))
  }

  /** (sigs, banded) for a document frame under the index's frozen
    * parameters — the ONE signature kernel every verb shares, identical
    * to [[Dedup.minHashCandidatePairs]]'s family (portable polynomial
    * folds, so the DuckDB oracle replays it). `sigs` is persisted: the
    * banding lambda references the signature column, and without the
    * materialization barrier CollapseProject would inline the whole
    * signature fold per band (numBands x recompute). */
  private def sigAndBand(docs: DataFrame, textCol: String, p: Params)
      : (DataFrame, DataFrame) = {
    val rows = p.numHashes / p.numBands
    val sigs = docs
      .select(col("doc_id"),
        TextAnalysis.hashedNgrams(col(textCol), p.n).as("grams"))
      .filter(size(col("grams")) > 0) // P sentinel sigs never pair
      .select(col("doc_id"),
        Dedup.minHashSignature(col("grams"), p.numHashes).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0L), lit(p.numBands - 1L)),
        b => struct(b.as("band"),
          Dedup.bandBucket(col("sig"), b, rows, 7L, 131L).as("bucket"))))
        .as("bb0"))
      .select(col("doc_id"),
        (col("bb0.band") * lit(P) + col("bb0.bucket")).as("bb"))
    (sigs, banded)
  }

  private def writeBatch(spark: SparkSession, dir: String, id: Long,
      sigs: DataFrame, banded: DataFrame, p: Params): Unit = {
    // sigs first, postings last: committed = BOTH _SUCCESS markers, so
    // a crash between the two writes leaves an uncommitted batch that
    // the replay overwrites (mode overwrite on both).
    sigs.select(col("doc_id"), col("sig"),
        pmod(col("doc_id"), lit(p.bucketShards.toLong)).as("idp"))
      .repartition(col("idp")).sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").partitionBy("idp")
      .parquet(s"${sigsRoot(dir)}/batch=$id")
    banded.select(col("bb"), col("doc_id"),
        pmod(col("bb"), lit(p.bucketShards.toLong)).as("bbp"))
      .repartition(col("bbp")).sortWithinPartitions(col("bb"))
      .write.mode("overwrite").partitionBy("bbp")
      .parquet(s"${postingsRoot(dir)}/batch=$id")
  }

  /** Create a fresh index at `dir` from `docs` (batch 0), freezing the
    * signature family. Destroys whatever was at `dir`. */
  def write(spark: SparkSession, docs: DataFrame, dir: String,
      textCol: String = "text", n: Int = 3, numHashes: Int = 64,
      numBands: Int = 16, bucketShards: Int = 64): Unit = {
    require(numHashes % numBands == 0,
      s"numHashes=$numHashes must divide into numBands=$numBands")
    val fs = fsOf(spark, dir)
    if (fs.exists(new Path(dir))) fs.delete(new Path(dir), true)
    val p = Params(n, numHashes, numBands, bucketShards)
    import spark.implicits._
    Seq((n, numHashes, numBands, bucketShards))
      .toDF("n", "num_hashes", "num_bands", "bucket_shards")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
    val (sigs, banded) = sigAndBand(docs, textCol, p)
    writeBatch(spark, dir, 0L, sigs, banded, p)
    sigs.unpersist()
    ()
  }

  /** Next default batch id: one past everything ever ingested — the
    * max of the live non-fold ids and the fold's coverage (GC'd folded
    * ids must never be reallocated: a reallocation would false-positive
    * the replay no-op check and swallow new data). */
  private def nextBatchId(fs: FileSystem, dir: String): Long = {
    val nonFold = committedBatches(fs, dir).filter(_ < FoldBase)
    val covered = foldInfo(fs, dir).map(_._2).getOrElse(-1L)
    math.max(nonFold.lastOption.getOrElse(-1L), covered) + 1L
  }

  /** A batch id counts as ingested when its directories committed OR a
    * fold covers it (its directories were GC'd but its content lives in
    * the fold). */
  private def alreadyIngested(fs: FileSystem, dir: String,
      id: Long): Boolean =
    committedBatches(fs, dir).contains(id) ||
      foldInfo(fs, dir).exists(id <= _._2)

  /** Add `batch` under `batchId` (default: one past everything ever
    * ingested) without querying. Replaying an ingested explicit id —
    * committed or already folded by [[compact]] — is a no-op. Returns
    * the id used. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long = -1L, textCol: String = "text"): Long = {
    val fs = fsOf(spark, dir)
    val id = if (batchId >= 0) batchId else nextBatchId(fs, dir)
    if (alreadyIngested(fs, dir, id)) return id
    val p = readParams(spark, dir)
    val (sigs, banded) = sigAndBand(batch, textCol, p)
    writeBatch(spark, dir, id, sigs, banded, p)
    sigs.unpersist()
    id
  }

  /** Near-dup pairs of `batch` against the index's committed batches
    * with id < `beforeBatchId` — READ-ONLY: nothing is written.
    * [[ingest]] passes its own batch id here so a REPLAY scores against
    * exactly the index the original run saw, even after later batches
    * commit (batch ids are monotone: default allocation is
    * max(committed)+1, and explicit ids — the stream discipline — must
    * be assigned in commit order for "id <" to mean "committed
    * before").
    *
    * Output: (batch_doc, index_doc, est_jaccard >= minEstJaccard).
    *
    * `probeCap` bounds the driver-side pruning lists: when the batch
    * touches at most `probeCap` distinct buckets, the postings scan is
    * filtered by an IN-list over (bbp, bb) — the partition column prunes
    * directories, the sorted data column prunes row groups; same for the
    * candidates' signature shards. Bigger batches fall back to keyed
    * equi-joins over the full (still text-free) index scan — the two
    * regimes are result-identical by construction and spec-pinned.
    *
    * Eager contract as [[Dedup.minHashCandidatePairs]]: the default
    * materializes the bounded pair result and releases the batch-sized
    * signature cache; `eager = false` keeps the plan inspectable. */
  def queryPairs(spark: SparkSession, dir: String, batch: DataFrame,
      textCol: String = "text", minEstJaccard: Double = 0.5,
      maxBucketSize: Int = 50, probeCap: Int = 4096,
      beforeBatchId: Long = Long.MaxValue, eager: Boolean = true)
      : DataFrame = {
    val p = readParams(spark, dir)
    val (bSigs, bBanded) = sigAndBand(batch, textCol, p)
    val out = queryPairsImpl(spark, dir, p, bSigs, bBanded, minEstJaccard,
      maxBucketSize, probeCap, beforeBatchId, eager)
    if (eager) bSigs.unpersist()
    out
  }

  /** The scoring core shared by [[queryPairs]] and [[ingest]] (which
    * computes the batch's signatures ONCE and reuses them for the append
    * write). Does not unpersist its inputs; with `eager` the bounded
    * pair result is materialized and the internal candidate cache
    * released. */
  private def queryPairsImpl(spark: SparkSession, dir: String, p: Params,
      bSigs: DataFrame, bBanded0: DataFrame, minEstJaccard: Double,
      maxBucketSize: Int, probeCap: Int, beforeBatchId: Long,
      eager: Boolean): DataFrame = {
    val fs = fsOf(spark, dir)
    // folds always participate: they cover only ids <= the marker's
    // coveredUpTo, and replay of folded-era batches is forfeited by
    // compact (documented there) — so for every replayable id the fold
    // is legitimately "committed before"
    val ids = activeBatches(fs, dir)
      .filter(b => b >= FoldBase || b < beforeBatchId)
      .filter(i => hasData(fs, s"${postingsRoot(dir)}/batch=$i"))
    if (ids.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)]
        .toDF("batch_doc", "index_doc", "est_jaccard")
    }
    val bBanded = bBanded0.persist(StorageLevel.MEMORY_AND_DISK)
    val postings = spark.read.option("basePath", postingsRoot(dir))
      .parquet(ids.map(i => s"${postingsRoot(dir)}/batch=$i"): _*)
    // ---- probe the postings: pruned IN-list scan while the batch's
    // bucket set is bounded, keyed semi-join past the cap
    val batchBuckets = bBanded.select(col("bb")).distinct()
      .limit(probeCap + 1)
      .collect().map(_.getLong(0))
    val probed =
      if (batchBuckets.length <= probeCap) {
        // floorMod, matching the pmod the write side partitions by —
        // Java % follows the sign and would silently miss negative keys
        val shards = batchBuckets.map(Math.floorMod(_, p.bucketShards.toLong))
          .distinct
        postings
          .filter(col("bbp").isin(shards.toSeq: _*) &&
            col("bb").isin(batchBuckets.toSeq: _*))
      } else postings.join(
        bBanded.select(col("bb"), pmod(col("bb"),
          lit(p.bucketShards.toLong)).as("bbp")).distinct(),
        Seq("bbp", "bb"), "left_semi")
    // stop-bucket guard on STORED posting counts: the filter above keeps
    // every stored row of each matched bucket, so the windowed count IS
    // the bucket's true stored size
    val sized = probed
      .withColumn("psz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bb"))))
      .filter(col("psz") <= maxBucketSize)
      .select(col("bb"), col("doc_id").as("index_doc"))
    val cand0 = bBanded.join(sized, Seq("bb"))
      .select(col("doc_id").as("batch_doc"), col("index_doc"))
      .dropDuplicates("batch_doc", "index_doc")
    // the candidate frame is consumed twice (the bounded id collect below
    // + the scoring join); cache it in the eager mode — the inspectable
    // mode skips the cache so the postings scan stays a plan LEAF (an
    // InMemoryRelation would swallow it) at the cost of recomputing cand
    val cand = if (eager) cand0.persist(StorageLevel.MEMORY_AND_DISK)
      else cand0
    // ---- signature verify: batch sigs are cached above; index sigs
    // read shard-pruned while the candidate set is bounded
    val candIds = cand.select(col("index_doc")).distinct()
      .limit(probeCap + 1)
      .collect().map(_.getLong(0))
    val sigScan = spark.read.option("basePath", sigsRoot(dir))
      .parquet(ids.map(i => s"${sigsRoot(dir)}/batch=$i"): _*)
    val idxSigs =
      if (candIds.length <= probeCap) {
        val shards = candIds.map(Math.floorMod(_, p.bucketShards.toLong))
          .distinct
        sigScan.filter(col("idp").isin(shards.toSeq: _*) &&
          col("doc_id").isin(candIds.toSeq: _*))
      } else sigScan.join(
        cand.select(col("index_doc").as("doc_id"),
          pmod(col("index_doc"), lit(p.bucketShards.toLong)).as("idp"))
          .distinct(),
        Seq("idp", "doc_id"), "left_semi")
    val scored = cand
      .join(bSigs.select(col("doc_id").as("batch_doc"), col("sig").as("siga")),
        "batch_doc")
      .join(idxSigs.select(col("doc_id").as("index_doc"),
        col("sig").as("sigb")), "index_doc")
      .select(col("batch_doc"), col("index_doc"),
        (size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y),
          x => x)).cast("double") / p.numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
    if (!eager) scored
    else {
      val out = scored.localCheckpoint(true)
      bBanded.unpersist(); cand.unpersist()
      out
    }
  }

  /** The nightly verb: score `batch` against everything committed BEFORE
    * it (ids < `batchId`), then land its postings/sigs under `batchId`.
    * With an explicit `batchId`, a replay returns the SAME pairs even
    * after later batches commit — the scored index is exactly the
    * original run's — and re-lands the same files: fully idempotent.
    * The batch's signatures are computed ONCE and shared by the scoring
    * and the append write. Default ids allocate max(committed)+1 and
    * must not be replayed (a replay would land under a fresh id, like
    * the vector store's batch-mode appends). */
  def ingest(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long = -1L, textCol: String = "text",
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 50,
      probeCap: Int = 4096): DataFrame = {
    val fs = fsOf(spark, dir)
    val id = if (batchId >= 0) batchId else nextBatchId(fs, dir)
    val p = readParams(spark, dir)
    val (sigs, banded) = sigAndBand(batch, textCol, p)
    val pairs = queryPairsImpl(spark, dir, p, sigs, banded, minEstJaccard,
      maxBucketSize, probeCap, beforeBatchId = id, eager = true)
    if (!alreadyIngested(fs, dir, id))
      writeBatch(spark, dir, id, sigs, banded, p)
    sigs.unpersist()
    pairs
  }

  /** Streaming ingest: every micro-batch of a document stream scores
    * against the index and lands under `batchBase + id` — a
    * crashed-and-replayed micro-batch whose directories committed (or
    * were folded) skips the write, and its pairs recompute identically
    * (the [[ingest]] replay contract), so the pair log under
    * `dir/pairs/batch=<id>` is overwritten with the same rows: no pair
    * is lost or doubled. The checkpoint lives INSIDE the index by
    * default, for the same reason [[VectorStore.appendStream]]'s does —
    * a temp checkpoint would restart micro-batch numbering at 0 and
    * every already-committed id would silently swallow new data.
    * Returns the started query; one active stream per index. */
  def ingestStream(spark: SparkSession, dir: String,
      docStream: DataFrame, textCol: String = "text",
      minEstJaccard: Double = 0.5, maxBucketSize: Int = 50,
      batchBase: Long = StreamBatchBase,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(batchBase >= StreamBatchBase && batchBase < FoldBase,
      s"batchBase must be in [$StreamBatchBase, $FoldBase): $batchBase")
    docStream.writeStream
      .option("checkpointLocation",
        checkpointLocation.getOrElse(s"$dir/_stream_checkpoint"))
      .foreachBatch { (df: DataFrame, id: Long) =>
        val pairs = ingest(spark, dir, df, batchId = batchBase + id,
          textCol = textCol, minEstJaccard = minEstJaccard,
          maxBucketSize = maxBucketSize)
        pairs.write.mode("overwrite")
          .parquet(s"$dir/pairs/batch=${batchBase + id}")
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
  }

  /** Offline fold: rewrite the SERVING batch set as ONE fold batch and
    * retire the inputs — a year of nightly ingests is hundreds of batch
    * directories whose commit probes and small files tax every query;
    * after compact the index is one folded batch plus whatever arrived
    * since.
    *
    * Protocol (object-store safe — no renames): the folded postings and
    * signatures land under a FRESH fold id (above [[FoldBase]], so an
    * unreferenced staging is invisible to every reader), then the
    * `_folded` marker — one small file naming (foldId, coveredUpTo) —
    * commits the swap, then the retired directories are deleted. A
    * crash before the marker leaves invisible staging the next compact
    * overwrites; a crash after it leaves covered directories every
    * reader already ignores and the next compact sweeps.
    *
    * Replay forfeiture: ingest replays of batches at or below
    * `coveredUpTo` see only the post-fold index (their "committed
    * before" view was folded away) — run compact when no replays of
    * old batches are pending, the [[VectorStore.compact]] discipline.
    * Result-invisible for every query and every future ingest:
    * spec-pinned. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val p = readParams(spark, dir)
    val active = activeBatches(fs, dir)
      .filter(i => hasData(fs, s"${postingsRoot(dir)}/batch=$i"))
    if (active.isEmpty) return
    val prev = foldInfo(fs, dir)
    val newFold = math.max(FoldBase, prev.map(_._1 + 1L).getOrElse(FoldBase))
    val covered = math.max(prev.map(_._2).getOrElse(-1L),
      active.filter(_ < FoldBase).lastOption.getOrElse(-1L))
    val banded = spark.read
      .option("basePath", postingsRoot(dir))
      .parquet(active.map(i => s"${postingsRoot(dir)}/batch=$i"): _*)
      .select(col("doc_id"), col("bb"))
    val sigs = spark.read
      .option("basePath", sigsRoot(dir))
      .parquet(active.map(i => s"${sigsRoot(dir)}/batch=$i"): _*)
      .select(col("doc_id"), col("sig"))
    writeBatch(spark, dir, newFold, sigs, banded, p)
    // THE COMMIT: readers switch to the fold the moment this lands
    graft.wri.WriFs.writeString(s"$dir/_folded", s"$newFold $covered #\n",
      spark.sparkContext.hadoopConfiguration)
    // GC: everything the marker retired — covered normal/stream batches
    // and superseded folds
    committedBatches(fs, dir)
      .filter(b => b != newFold && (b >= FoldBase || b <= covered))
      .foreach { b =>
        fs.delete(new Path(s"${postingsRoot(dir)}/batch=$b"), true)
        fs.delete(new Path(s"${sigsRoot(dir)}/batch=$b"), true)
      }
  }
}

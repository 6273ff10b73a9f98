package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-backed IVF-PQ vector store — [[Pq.ivfPqTopK]]'s in-memory
  * composition persisted as a QUERYABLE TABLE LAYOUT: PQ codes written
  * as parquet PARTITIONED BY the coarse cell id, so an ANN query prunes
  * at the DIRECTORY level (PartitionFilters) and the scan never opens
  * the files of unprobed cells. This is the piece that turns the
  * IVF-PQ math into a production vector store: at 100 TB the win is not
  * the ADC arithmetic, it is that a query with nprobe=2 of 8 cells
  * reads 1/4 of the files — the same never-open-the-file economics as
  * [[Layout]]'s clustered writes and the COG range-read path.
  *
  * Layout under `dir`:
  *   codes/batch=<b>/cell=<c>/  (vec_id, codes array<int>) — m bytes of
  *                    PQ code per vector, the only thing a query scans.
  *                    batch 0 is the initial write; appends (batch and
  *                    streaming) add whole batch directories, which
  *                    makes ingest IDEMPOTENT at the batch level (a
  *                    replayed micro-batch that finds its directory
  *                    already present skips — the foreachBatch sink
  *                    discipline). Queries filter on cell only, and
  *                    cell stays a partition column, so directory
  *                    pruning is unaffected by the batch level.
  *   centroids/       (cell, centroid array<double>) — coarse cells
  *   codebooks/       (j, code, centroid array<double>) — shared
  *                    residual codebooks (classic IVFADC)
  *
  * Everything is deterministic and bit-identical to [[Pq.ivfPqTopK]]
  * with the same parameters: same k-means init/merge order, same
  * residual quantization, same first-min code ties, and doubles/ints
  * round-trip parquet exactly — so the q100 verify-time replay oracle
  * pins the DISK path too (q147). Centroid/codebook tables are
  * vocabulary metadata (cells + m x codebookSize rows): they collect to
  * the driver at query time, the store's only non-scan reads.
  */
object VectorStore {

  /** Train coarse cells + residual codebooks over `emb` and write the
    * store under `dir` (overwrite). One training pipeline, one
    * partitioned write; the corpus never shuffles except the
    * partitionBy(cell) write placement. */
  def write(spark: SparkSession, emb: DataFrame, dir: String,
      cells: Int = 8, m: Int = 8, codebookSize: Int = 16,
      kmeansIters: Int = 3): Unit = {
    import spark.implicits._
    require(cells >= 1 && m >= 1 && codebookSize >= 2 && codebookSize <= 256,
      s"need cells >= 1, m >= 1, codebookSize in [2,256]: " +
        s"$cells/$m/$codebookSize")
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coarse = Similarity.kMeansCentroids(vecs, cells, kmeansIters)
    val cs = coarse
    val assigned = vecs.as[(Long, Array[Float])]
      .map { case (id, v) =>
        val c = Similarity.nearestCentroid(v, cs)
        val res = new Array[Float](v.length)
        var i = 0
        while (i < v.length) { res(i) = (v(i) - cs(c)(i)).toFloat; i += 1 }
        (id, c, res)
      }
      .toDF("vec_id", "cell", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val books = Pq.trainCodebooks(assigned, m, codebookSize, kmeansIters)
    assigned
      .select(col("vec_id"), lit(0L).as("batch"), col("cell"),
        Pq.encode(col("embedding"), books).as("codes"))
      .write.partitionBy("batch", "cell").mode("overwrite")
      .parquet(s"$dir/codes")
    coarse.zipWithIndex
      .map { case (cent, c) => (c, cent.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, code) => (j, code, cent.toSeq) }
    }.toSeq.toDF("j", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    assigned.unpersist()
    vecs.unpersist()
  }

  /** Incremental ingest — the production pattern: NEW vectors join an
    * existing store WITHOUT retraining. The frozen centroids/codebooks
    * collect to the driver (bounded metadata), each new vector assigns
    * to its nearest EXISTING cell and encodes its residual against the
    * FROZEN codebooks, and the code rows append into the cell
    * partitions — a pure map stage plus a partitioned parquet append;
    * the existing corpus is never read or rewritten. Queries see old
    * and new vectors identically (same cells, same ADC tables).
    * Quantization drift is the stated trade: appended vectors are coded
    * against codebooks trained before they existed — monitor and
    * retrain offline when recall decays, as every IVF store does.
    * Idempotence: each append lands as one NEW `batch=<id>` directory
    * (id = max existing + 1 unless pinned); an append whose batch
    * directory already exists is a NO-OP, so a replayed micro-batch or
    * retried job cannot duplicate rows. Duplicate vec_ids ACROSS
    * distinct batches remain the caller's contract (dedup ids upstream,
    * the q90 incremental-ingest discipline). */
  def append(spark: SparkSession, dir: String, emb: DataFrame,
      batchId: Option[Long] = None): Unit = {
    import spark.implicits._
    val existing = Option(new java.io.File(s"$dir/codes").list())
      .getOrElse(Array.empty[String])
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
    val id = batchId.getOrElse(if (existing.isEmpty) 1L else existing.max + 1)
    if (existing.contains(id)) return // replay of a committed batch
    val coarse: Array[Array[Double]] = spark.read.parquet(s"$dir/centroids")
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    val booksFlat = spark.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Seq[Double])].collect()
    require(coarse.nonEmpty && booksFlat.nonEmpty,
      s"$dir does not hold a written store (empty centroids/codebooks)")
    val m = booksFlat.map(_._1).max + 1
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      booksFlat.filter(_._1 == j).sortBy(_._2).map(_._3.toArray)
    }
    val cs = coarse
    emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id0, v) =>
        val c = Similarity.nearestCentroid(v, cs)
        val res = new Array[Float](v.length)
        var i = 0
        while (i < v.length) { res(i) = (v(i) - cs(c)(i)).toFloat; i += 1 }
        (id0, c, res)
      }
      .toDF("vec_id", "cell", "embedding")
      .select(col("vec_id"), col("cell"),
        Pq.encode(col("embedding"), books).as("codes"))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(s"$dir/codes/batch=$id")
  }

  /** Streaming ingest: every micro-batch of an embedding stream appends
    * through [[append]] under a batch id derived from the stream's own
    * micro-batch id (offset by `batchBase` so stream batches never
    * collide with batch-mode appends) — a crashed-and-replayed
    * micro-batch finds its directory committed and skips, the
    * exactly-once foreachBatch sink discipline the streaming suite pins
    * for parquet. Returns the started query; one active stream per
    * store. */
  def appendStream(spark: SparkSession, dir: String,
      embStream: DataFrame,
      batchBase: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery =
    embStream.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        append(spark, dir, df, batchId = Some(batchBase + id))
      }
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()

  /** Tombstone deletes — the third lifecycle verb (a dedup or takedown
    * pass removes vectors from retrieval without rewriting code files):
    * the ids land as a `deletes/batch=<id>` directory (same
    * batch-directory idempotence as [[append]]) and every query
    * anti-joins them out BEFORE scoring. A tombstone is FINAL for its
    * vec_id — it masks every stored row with that id, past and future;
    * re-ingest under a fresh id. Space is reclaimed offline by a
    * rewrite (the compaction discipline), never in the serving path. */
  def delete(spark: SparkSession, dir: String, ids: DataFrame,
      batchId: Option[Long] = None): Unit = {
    val existing = Option(new java.io.File(s"$dir/deletes").list())
      .getOrElse(Array.empty[String])
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
    val id = batchId.getOrElse(if (existing.isEmpty) 1L else existing.max + 1)
    if (existing.contains(id)) return
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .write.mode("overwrite").parquet(s"$dir/deletes/batch=$id")
  }

  /** Offline compaction — the space-reclaim half of the tombstone
    * contract: fold every append batch into one batch-0 layout with the
    * tombstoned rows physically dropped, then clear the tombstones.
    * Codes and metadata are untouched semantically, so any query
    * returns bit-identical results before and after (spec-pinned); what
    * changes is the file layout — one directory per cell again instead
    * of one per (batch, cell), and no anti-join work in the serving
    * path. Runs OFFLINE by construction: the rewrite lands in a
    * temporary directory and swaps in with two renames, so a crash
    * leaves either the old store or the new one, never a mix. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val live = {
      val codes = spark.read.parquet(s"$dir/codes")
        .select(col("vec_id"), col("cell"), col("codes"))
      if (new java.io.File(s"$dir/deletes").exists())
        codes.join(spark.read.parquet(s"$dir/deletes").select(col("vec_id")),
          Seq("vec_id"), "left_anti")
      else codes
    }
    live.select(col("vec_id"), lit(0L).as("batch"), col("cell"), col("codes"))
      .write.partitionBy("batch", "cell").mode("overwrite")
      .parquet(s"$dir/codes_compact")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(s"$dir/codes"))
    rm(new java.io.File(s"$dir/deletes"))
    require(new java.io.File(s"$dir/codes_compact")
      .renameTo(new java.io.File(s"$dir/codes")),
      s"compaction swap failed for $dir")
  }

  /** Approximate top-k nearest (squared L2) to `queryVec` from the
    * store: centroids/codebooks collect to the driver (bounded
    * metadata), the `nprobe` nearest cells and their ADC tables are
    * computed there, and the ONLY corpus work is a scan of the probed
    * cells' code files — `cell.isin(probed)` lands in PartitionFilters,
    * so unprobed cells' files are never opened (asserted in
    * VectorStoreSpec). Scoring is m table lookups per stored code row,
    * then one TakeOrderedAndProject. */
  def queryTopK(spark: SparkSession, dir: String, queryVec: Array[Float],
      k: Int, nprobe: Int = 2,
      excludeVecId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    require(k >= 1 && nprobe >= 1, s"need k >= 1 and nprobe >= 1: $k/$nprobe")
    val coarse: Array[Array[Double]] = spark.read.parquet(s"$dir/centroids")
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
    val booksFlat = spark.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Seq[Double])].collect()
    require(coarse.nonEmpty && booksFlat.nonEmpty,
      s"$dir does not hold a written store (empty centroids/codebooks)")
    val m = booksFlat.map(_._1).max + 1
    val codebookSize = booksFlat.map(_._2).max + 1
    val books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      booksFlat.filter(_._1 == j).sortBy(_._2).map(_._3.toArray)
    }
    val sub = books.head.head.length
    val cells = coarse.length
    require(queryVec.length == m * sub,
      s"query dim ${queryVec.length} != ${m * sub}")
    // stable sort: equal distances tie-break to the lower cell id — the
    // exact probe rule of Pq.ivfPqTopK
    val probed = coarse.indices.sortBy { c =>
      var d = 0.0; var i = 0
      while (i < queryVec.length) {
        val x = queryVec(i) - coarse(c)(i); d += x * x; i += 1
      }
      d
    }.take(nprobe)
    val adc: Seq[Seq[Seq[Double]]] = Seq.tabulate(cells) { c =>
      if (!probed.contains(c)) Seq.fill(m)(Seq.fill(codebookSize)(0.0))
      else Seq.tabulate(m) { j =>
        Seq.tabulate(codebookSize) { code =>
          var d = 0.0; var i = 0
          val cent = books(j)(code)
          while (i < sub) {
            val qr = (queryVec(j * sub + i) - coarse(c)(j * sub + i)).toFloat
            val diff = qr - cent(i); d += diff * diff; i += 1
          }
          d
        }
      }
    }
    val base = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isInCollection(probed))
    val excluded = excludeVecId match {
      case Some(id) => base.filter(col("vec_id") =!= id)
      case None => base
    }
    // tombstones mask rows before any scoring work is spent on them
    val scanned =
      if (new java.io.File(s"$dir/deletes").exists())
        excluded.join(
          spark.read.parquet(s"$dir/deletes").select(col("vec_id")),
          Seq("vec_id"), "left_anti")
      else excluded
    scanned
      .select(col("vec_id"),
        round(aggregate(
          zip_with(col("codes"),
            element_at(typedLit(adc), col("cell") + 1),
            (code, row) => element_at(row, code + 1)),
          lit(0.0), (a, x) => a + x), 6).as("approx_d2"))
      .orderBy(col("approx_d2"), col("vec_id"))
      .limit(k)
  }
}

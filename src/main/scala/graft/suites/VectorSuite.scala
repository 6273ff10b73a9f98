package graft.suites

import graft.{Q, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding / similarity-search surface: array ops, exact cosine top-k,
  * LSH-bucketed approximate search (SURVEY training-data extensions).
  */
object VectorSuite {

  lazy val all: Seq[Q] = Seq(
    Q("q22_array_ops", q22, Some(q22Sql)),
    Q("q37_cosine_topk", q37, Some(q37Sql)),
    Q("q39_ann_lsh", q39, Some(q39Sql)),
    Q("q44_ivf_topk", q44, None, Some(q44Oracle)),
    Q("q48_embedding_neardup", q48, Some(q48Sql)),
    Q("q66_lsh_neardup_pairs", q66, Some(q66Sql)),
    Q("q70_ann_multiprobe", q70, Some(q70Sql)),
    Q("q82_int8_quantize", q82, Some(q82Sql)),
    Q("q98_pq_topk", q98, None, Some(q98Oracle)),
    Q("q100_ivfpq_topk", q100, None, Some(q100Oracle)),
    Q("q101_semantic_dedup", q101, Some(q101Sql)),
    Q("q103_projected_topk", q103, Some(q103Sql)),
    Q("q109_ann_knn_join", q109, Some(q109Sql)),
    Q("q140_filtered_ann", q140, Some(q140Sql)),
    // the DISK path must land on bit-identical scores, so it shares
    // q100's verify-time replay oracle verbatim
    Q("q147_vector_store_topk", q147, None, Some(q100Oracle)),
    Q("q148_vector_store_append", q148, None, Some(q148Oracle)),
    Q("q149_ann_recall", q149, Some(q149Sql)),
    Q("q150_vector_store_delete", q150, None, Some(q150Oracle)),
    Q("q151_vector_store_batch_topk", q151, None, Some(q151Oracle)),
    Q("q152_vector_store_retrain", q152, None, Some(q152Oracle)),
    Q("q156_semantic_dedup_store", q156, None, Some(q156Oracle)),
    Q("q170_vector_store_validate", q170, None, Some(q170Oracle))
  )

  /** Ingest-time semantic dedup against the persisted store
    * ([[graft.ops.VectorStore.semanticDedupBatch]]): a batch of exact
    * re-ingests (every 25th corpus vector under fresh ids) and
    * genuinely novel vectors (+4.0 per dimension) asks the q147 store
    * for nearest stored neighbors in ONE job; re-ingests land at pure
    * quantization error (measured ~0.15-0.67 at sf0.001) and must flag
    * as duplicates under the 100.0 threshold, the shifted cluster
    * (~1000) must not. The oracle replays the whole batch's k=1 ADC
    * scoring and the threshold decision row for row. */
  private def q156(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dir = q147Store(s, d)
    val copies = emb.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val shifted = emb.filter(col("vec_id") % 25 === 7)
      .select((col("vec_id") + 300000L).as("vec_id"),
        transform(col("embedding"), x => (x + lit(4.0f)).cast("float"))
          .as("embedding"))
    graft.ops.VectorStore.semanticDedupBatch(s, dir,
        copies.unionByName(shifted), maxApproxD2 = 100.0)
      .orderBy(col("vec_id"))
  }

  private def q156Oracle(s: SparkSession, d: String): String = {
    import s.implicits._
    val embSel = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kMeansCentroids(embSel, k = 8, iters = 3)
    val cs = coarse
    val resDf = embSel.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d)
    val assigned = vecs.map { case (id, v) =>
      (id, v, Similarity.nearestCentroid(v, coarse))
    }
    val qs =
      vecs.filter(_._1 % 25 == 0).map { case (id, v) => (id + 200000L, v) } ++
      vecs.filter(_._1 % 25 == 7).map { case (id, v) =>
        (id + 300000L, v.map(x => x + 4.0f))
      }
    val rows = qs.sortBy(_._1).map { case (qid, qv) =>
      val probed = coarse.indices
        .sortBy(c => sliceD2(coarse(c), qv, 0)).take(2)
      def adc(c: Int, j: Int, code: Int): Double = {
        var dd = 0.0; var i = 0
        val cent = books(j)(code)
        while (i < sub) {
          val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
          val diff = qr - cent(i); dd += diff * diff; i += 1
        }
        dd
      }
      val best = assigned.iterator
        .filter { case (_, _, c) => probed.contains(c) }
        .map { case (id, v, c) =>
          val res =
            Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
          var approx = 0.0
          var j = 0
          while (j < books.length) {
            val code = argminCode(books(j), res, j * sub)
            approx += adc(c, j, code)
            j += 1
          }
          (id, round6(approx))
        }
        .toSeq.sortBy { case (id, dd) => (dd, id) }.headOption
      best match {
        case Some((nid, dd)) =>
          s"  (CAST($qid AS BIGINT), ${dd <= 100.0}, " +
            s"CAST($nid AS BIGINT), CAST($dd AS DOUBLE))"
        case None =>
          s"  (CAST($qid AS BIGINT), false, " +
            "CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE))"
      }
    }
    rows.mkString("SELECT * FROM (VALUES\n", ",\n",
      "\n) t(vec_id, is_dup, near_id, approx_d2) ORDER BY vec_id")
  }

  /** Retrained store ([[graft.ops.VectorStore.retrain]]): the full
    * lifecycle — write on the even half, append the odd half against
    * frozen books, tombstone every vec_id % 10 == 3, then retrain from
    * the lake table. The store must serve as if freshly TRAINED on
    * exactly the live set (all ids minus the tombstoned ones): the
    * oracle replays the trainers on the same canonicalized live corpus
    * (`repartition(P, vec_id) + sortWithinPartitions` — retrain's
    * documented determinism contract) and scores the live vectors
    * against the NEW cells and codebooks. */
  private val retrainStoreDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def q152(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = retrainStoreDirs.getOrElseUpdate(d, {
      val out = java.nio.file.Files.createTempDirectory("vecstore_rt")
        .toString
      graft.ops.VectorStore.write(s, emb.filter(col("vec_id") % 2 === 0), out)
      graft.ops.VectorStore.append(s, out, emb.filter(col("vec_id") % 2 === 1))
      graft.ops.VectorStore.delete(s, out,
        emb.filter(col("vec_id") % 10 === 3).select(col("vec_id")))
      graft.ops.VectorStore.retrain(s, out, emb)
      out
    })
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Array[Float]].head()
    graft.ops.VectorStore.queryTopK(s, dir, qv, k = 10, nprobe = 2,
      excludeVecId = Some(0L))
  }

  private def q152Oracle(s: SparkSession, d: String): String = {
    import s.implicits._
    // the live corpus, canonicalized exactly as retrain does internally
    val p = s.sessionState.conf.numShufflePartitions
    val live = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 10 =!= 3)
      .repartition(p, col("vec_id")).sortWithinPartitions("vec_id")
    val coarse = Similarity.kMeansCentroids(live, k = 8, iters = 3)
    val cs = coarse
    val resDf = live.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d).filter(_._1 % 10 != 3) // live rows only
    val qv = vecs.find(_._1 == 0L).get._2
    val probed = coarse.indices.sortBy(c => sliceD2(coarse(c), qv, 0)).take(2)
    def adc(c: Int, j: Int, code: Int): Double = {
      var dd = 0.0; var i = 0
      val cent = books(j)(code)
      while (i < sub) {
        val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
        val diff = qr - cent(i); dd += diff * diff; i += 1
      }
      dd
    }
    val top = vecs.iterator.filter(_._1 != 0L).flatMap { case (id, v) =>
      val c = Similarity.nearestCentroid(v, coarse)
      if (!probed.contains(c)) None
      else {
        val res = Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
        var approx = 0.0
        var j = 0
        while (j < books.length) {
          val code = argminCode(books(j), res, j * sub)
          approx += adc(c, j, code)
          j += 1
        }
        Some((id, round6(approx)))
      }
    }.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
    valuesPin(top, "approx_d2", "ORDER BY approx_d2, vec_id")
  }

  /** Tombstone deletes ([[graft.ops.VectorStore.delete]]): the store
    * holds the full corpus, every vec_id % 10 == 3 is tombstoned, and a
    * query must rank as if those vectors never existed — the oracle is
    * the q100 replay with the deleted ids filtered from the candidate
    * universe, so a tombstone that leaks into (or over-masks) the
    * ranking breaks the hash. */
  private val deleteStoreDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def deleteStore(s: SparkSession, d: String): String =
    deleteStoreDirs.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
      val out = java.nio.file.Files.createTempDirectory("vecstore_del")
        .toString
      graft.ops.VectorStore.write(s, emb, out)
      graft.ops.VectorStore.delete(s, out,
        emb.filter(col("vec_id") % 10 === 3).select(col("vec_id")))
      out
    })

  private def q150(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = deleteStore(s, d)
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Array[Float]].head()
    graft.ops.VectorStore.queryTopK(s, dir, qv, k = 10, nprobe = 2,
      excludeVecId = Some(0L))
  }

  /** Store QA sweep ([[graft.ops.VectorStore.validate]]) — the q168
    * discipline for the drift-prone store: per cell, the committed code
    * rows are compared against a fresh assign+encode of the lake under
    * the FROZEN centroids/codebooks — row count plus an xor-of-hashes
    * content checksum over (vec_id, cell, codes), tombstones masked on
    * both sides. Runs against q150's tombstoned store, so the sweep's
    * masking is exercised, not just its happy path. The oracle is an
    * independent driver-side replay of the whole expectation — k-means,
    * residual codebooks, per-vector assignment and first-min encoding,
    * the fold hash, the per-cell xor — pinning every cell's count AND
    * checksum value with ok = true. Lost-batch / duplicate-append /
    * drifted-code failure paths are spec-pinned. */
  private def q170(s: SparkSession, d: String): DataFrame =
    graft.ops.VectorStore.validate(s, deleteStore(s, d),
        Tables.embeddings(s, d))
      .orderBy(col("cell"))

  private def q170Oracle(s: SparkSession, d: String): String = {
    val embSel = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kMeansCentroids(embSel, k = 8, iters = 3)
    val resDf = {
      import s.implicits._
      val cs = coarse
      embSel.as[(Long, Array[Float])].map { case (id, v) =>
        val c = Similarity.nearestCentroid(v, cs)
        (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
      }.toDF("vec_id", "embedding")
    }
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8,
      codebookSize = 16, kmeansIters = 3)
    val sub = books.head.head.length
    val P = 1000000007L
    val per = scala.collection.mutable.Map.empty[Int, (Long, Long)]
    collectVecs(s, d).iterator
      .filter { case (id, _) => id % 10 != 3 } // tombstoned out, both sides
      .foreach { case (id, v) =>
        val c = Similarity.nearestCentroid(v, coarse)
        val res =
          Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
        var h = (7L * 131L + id) % P
        h = (h * 131L + c) % P
        var j = 0
        while (j < books.length) {
          h = (h * 131L + argminCode(books(j), res, j * sub)) % P
          j += 1
        }
        val (n, x) = per.getOrElse(c, (0L, 0L))
        per(c) = (n + 1L, x ^ h)
      }
    per.toSeq.sortBy(_._1).map { case (c, (n, x)) =>
      s"  (CAST($c AS BIGINT), CAST($n AS BIGINT), CAST($n AS BIGINT), " +
        s"CAST($x AS BIGINT), TRUE, 'ok')"
    }.mkString("SELECT * FROM (VALUES\n", ",\n",
      "\n) t(cell, stored, expected, checksum, ok, reason) ORDER BY cell")
  }

  /** Shared with [[TextSuite]]'s q167 composition: the vector half of
    * the takedown-compliance oracle is exactly this replay (compact is
    * result-invisible, so the post-reclaim serving pins to the same
    * tombstone-filtered ranking). */
  private[suites] def q150Oracle(s: SparkSession, d: String): String =
    vecDeleteOracle(s, d, _ % 10 == 3)

  /** The q150 replay with a caller-chosen tombstone predicate — q169's
    * three-store composition takes down `% 7 == 3` everywhere, so its
    * vector half needs the same ranking under THAT id set. */
  private[suites] def vecDeleteOracle(s: SparkSession, d: String,
      tombstoned: Long => Boolean): String = {
    import s.implicits._
    val embSel = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kMeansCentroids(embSel, k = 8, iters = 3)
    val cs = coarse
    val resDf = embSel.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d)
    val qv = vecs.find(_._1 == 0L).get._2
    val probed = coarse.indices.sortBy(c => sliceD2(coarse(c), qv, 0)).take(2)
    def adc(c: Int, j: Int, code: Int): Double = {
      var dd = 0.0; var i = 0
      val cent = books(j)(code)
      while (i < sub) {
        val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
        val diff = qr - cent(i); dd += diff * diff; i += 1
      }
      dd
    }
    val top = vecs.iterator
      .filter { case (id, _) => id != 0L && !tombstoned(id) }
      .flatMap { case (id, v) =>
        val c = Similarity.nearestCentroid(v, coarse)
        if (!probed.contains(c)) None
        else {
          val res =
            Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
          var approx = 0.0
          var j = 0
          while (j < books.length) {
            val code = argminCode(books(j), res, j * sub)
            approx += adc(c, j, code)
            j += 1
          }
          Some((id, round6(approx)))
        }
      }.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
    valuesPin(top, "approx_d2", "ORDER BY approx_d2, vec_id")
  }

  /** ANN recall monitoring ([[Similarity.annRecallAtK]]): every 25th
    * vector queries the corpus through the banded-LSH kNN (q109's exact
    * configuration, hot-bucket cap included) AND through brute force;
    * the per-query intersection counts are integers, so the oracle
    * replays BOTH rankings end-to-end — banding, cap, candidate join,
    * rounded-cosine tiebreaks, and the ground-truth window. The
    * recall-after-rebuild check a production retrieval stack schedules. */
  private def q149(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.annRecallAtK(emb.filter(col("vec_id") % 25 === 0), emb, k = 5)
      .orderBy(col("query_id"))
  }

  private val q149Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |capped AS (SELECT vec_id, band, bucket FROM (
      |    SELECT vec_id, band, bucket, row_number() OVER (
      |      PARTITION BY band, bucket ORDER BY vec_id) AS rn FROM banded)
      |  WHERE rn <= 1024),
      |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id
      |  FROM banded q JOIN capped c USING (band, bucket)
      |  WHERE q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id),
      |scored AS (SELECT query_id, cand.vec_id,
      |    round(
      |      list_sum(list_transform(list_zip(eq.embedding, ec.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(eq.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(ec.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM cand
      |  JOIN embeddings eq ON eq.vec_id = cand.query_id
      |  JOIN embeddings ec ON ec.vec_id = cand.vec_id),
      |ann AS (SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS r FROM scored) WHERE r <= 5),
      |exactscore AS (SELECT eq.vec_id AS query_id, ec.vec_id,
      |    round(
      |      list_sum(list_transform(list_zip(eq.embedding, ec.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(eq.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(ec.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM embeddings eq JOIN embeddings ec ON ec.vec_id <> eq.vec_id
      |  WHERE eq.vec_id % 25 = 0),
      |exact AS (SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS r FROM exactscore) WHERE r <= 5),
      |qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 25 = 0),
      |na AS (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1),
      |nh AS (SELECT query_id, count(*) AS n_hits
      |  FROM ann JOIN exact USING (query_id, vec_id) GROUP BY 1)
      |SELECT query_id,
      |  CAST(COALESCE(n_ann, 0) AS BIGINT) AS n_ann,
      |  CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits
      |FROM qs LEFT JOIN na USING (query_id) LEFT JOIN nh USING (query_id)
      |ORDER BY query_id""".stripMargin

  /** Disk-backed vector store ([[graft.ops.VectorStore]]): the q100
    * IVF-PQ composition persisted as parquet PQ codes PARTITIONED BY
    * coarse cell, then queried with `cell IN probed` landing in
    * PartitionFilters — the scan never opens unprobed cells' files
    * (directory-level pruning, asserted in VectorStoreSpec). The store
    * builds once per (JVM, SF) and every query is a read-only scan of
    * nprobe/cells of the code files + m table lookups per row. Same
    * deterministic trainers as q100, so its replay oracle pins this
    * path bit-for-bit too. */
  private val storeDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def q147Store(s: SparkSession, d: String): String =
    storeDirs.getOrElseUpdate(d, {
      val out = java.nio.file.Files.createTempDirectory("vecstore").toString
      graft.ops.VectorStore.write(s, Tables.embeddings(s, d), out)
      out
    })

  private def q147(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = q147Store(s, d)
    val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Array[Float]].head()
    graft.ops.VectorStore.queryTopK(s, dir, qv, k = 10, nprobe = 2,
      excludeVecId = Some(0L))
  }

  /** Batch ANN over the disk store
    * ([[graft.ops.VectorStore.queryTopKBatch]]): every 25th vector
    * queries the q147 store in ONE distributed job — per-query probes
    * and ADC tables computed query-side, one pruned scan of the probed
    * cells' union for ALL queries, per-query top-5 as a row_number
    * window. The oracle extends q147's replay to the whole query set:
    * same trainers, same per-cell ADC arithmetic, same
    * (approx_d2, vec_id) ranking — each query's rows must match what
    * single-query [[graft.ops.VectorStore.queryTopK]] serves
    * (additionally spec-pinned 1-row-batch == single-query). */
  private def q151(s: SparkSession, d: String): DataFrame = {
    val dir = q147Store(s, d)
    graft.ops.VectorStore.queryTopKBatch(s, dir,
        Tables.embeddings(s, d).filter(col("vec_id") % 25 === 0),
        k = 5, nprobe = 2)
      .orderBy(col("query_id"), col("knn_rank"))
  }

  private def q151Oracle(s: SparkSession, d: String): String = {
    import s.implicits._
    val embSel = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kMeansCentroids(embSel, k = 8, iters = 3)
    val cs = coarse
    val resDf = embSel.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d)
    val assigned = vecs.map { case (id, v) =>
      (id, v, Similarity.nearestCentroid(v, coarse))
    }
    val rows = vecs.filter(_._1 % 25 == 0).sortBy(_._1).flatMap {
      case (qid, qv) =>
        val probed = coarse.indices
          .sortBy(c => sliceD2(coarse(c), qv, 0)).take(2)
        def adc(c: Int, j: Int, code: Int): Double = {
          var dd = 0.0; var i = 0
          val cent = books(j)(code)
          while (i < sub) {
            val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
            val diff = qr - cent(i); dd += diff * diff; i += 1
          }
          dd
        }
        assigned.iterator
          .filter { case (id, _, c) => id != qid && probed.contains(c) }
          .map { case (id, v, c) =>
            val res =
              Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
            var approx = 0.0
            var j = 0
            while (j < books.length) {
              val code = argminCode(books(j), res, j * sub)
              approx += adc(c, j, code)
              j += 1
            }
            (id, round6(approx))
          }
          .toSeq.sortBy { case (id, dd) => (dd, id) }.take(5)
          .zipWithIndex
          .map { case ((id, dd), r) => (qid, id, dd, r + 1L) }
    }
    rows.map { case (qid, id, dd, r) =>
      s"  (CAST($qid AS BIGINT), CAST($id AS BIGINT), " +
        s"CAST($dd AS DOUBLE), CAST($r AS BIGINT))"
    }.mkString("SELECT * FROM (VALUES\n", ",\n",
      "\n) t(query_id, vec_id, approx_d2, knn_rank) " +
        "ORDER BY query_id, knn_rank")
  }

  /** Incremental store ingest ([[graft.ops.VectorStore.append]]): the
    * store trains on HALF the corpus (even vec_ids), the odd half
    * appends later against the FROZEN centroids/codebooks — no retrain,
    * no rewrite of existing partitions — and a query over the combined
    * store must rank old and new vectors identically. The oracle
    * replays exactly that asymmetry: coarse cells + codebooks from the
    * even half only, every vector (both halves) assigned and coded
    * against them. */
  private val appendStoreDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def q148(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val dir = appendStoreDirs.getOrElseUpdate(d, {
      val out = java.nio.file.Files.createTempDirectory("vecstore_app").toString
      graft.ops.VectorStore.write(s, emb.filter(col("vec_id") % 2 === 0), out)
      graft.ops.VectorStore.append(s, out,
        emb.filter(col("vec_id") % 2 === 1))
      out
    })
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Array[Float]].head()
    graft.ops.VectorStore.queryTopK(s, dir, qv, k = 10, nprobe = 2,
      excludeVecId = Some(0L))
  }

  private def q148Oracle(s: SparkSession, d: String): String = {
    import s.implicits._
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") % 2 === 0)
    val coarse = Similarity.kMeansCentroids(base, k = 8, iters = 3)
    val cs = coarse
    val resDf = base.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d) // BOTH halves score against frozen books
    val qv = vecs.find(_._1 == 0L).get._2
    val probed = coarse.indices.sortBy(c => sliceD2(coarse(c), qv, 0)).take(2)
    def adc(c: Int, j: Int, code: Int): Double = {
      var dd = 0.0; var i = 0
      val cent = books(j)(code)
      while (i < sub) {
        val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
        val diff = qr - cent(i); dd += diff * diff; i += 1
      }
      dd
    }
    val top = vecs.iterator.filter(_._1 != 0L).flatMap { case (id, v) =>
      val c = Similarity.nearestCentroid(v, coarse)
      if (!probed.contains(c)) None
      else {
        val res = Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
        var approx = 0.0
        var j = 0
        while (j < books.length) {
          val code = argminCode(books(j), res, j * sub)
          approx += adc(c, j, code)
          j += 1
        }
        Some((id, round6(approx)))
      }
    }.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
    valuesPin(top, "approx_d2", "ORDER BY approx_d2, vec_id")
  }

  /** Metadata-filtered vector search
    * ([[Similarity.filteredCosineTopK]]): top-10 by cosine among vectors
    * with `label = 1` only. The predicate lands in the parquet scan's
    * PushedFilters (asserted in PlanSpec), so only the filtered slice is
    * read or scored — pre-filtering, not post-filtering. */
  private def q140(s: SparkSession, d: String): DataFrame =
    Similarity.filteredCosineTopK(Tables.embeddings(s, d),
      col("label") === 1, queryVecId = 0L, k = 10)

  private val q140Sql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT vec_id, label,
      |  list_sum(list_transform(list_zip(embedding, qe),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
      |  sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
      |  sqrt(list_sum(list_transform(qe,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n2
      |  FROM embeddings, q WHERE label = 1 AND vec_id <> 0)
      |SELECT vec_id, label, round(dot / (n1 * n2), 6) AS cosine FROM s
      |ORDER BY round(dot / (n1 * n2), 6) DESC, vec_id LIMIT 10""".stripMargin

  /** Batch ANN kNN join ([[Similarity.annKnnJoin]]): every 25th vector is
    * a query and gets its top-5 neighbors from the whole corpus in ONE
    * distributed job — banded ids meet in a (band, bucket) equi-join,
    * pairs dedup before scoring, and the per-query top-5 is a row_number
    * window. The oracle replays the entire pipeline: portable planes,
    * banding, the corpus-side hot-bucket cap (first 1024 per bucket by
    * vec_id), candidate join, exact cosine, and the ranked cut. */
  private def q109(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.annKnnJoin(emb.filter(col("vec_id") % 25 === 0), emb, k = 5)
      .select(col("query_id"), col("vec_id"), col("cosine"),
        col("rank").as("knn_rank"))
      .orderBy(col("query_id"), col("knn_rank"))
  }

  private val q109Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |capped AS (SELECT vec_id, band, bucket FROM (
      |    SELECT vec_id, band, bucket, row_number() OVER (
      |      PARTITION BY band, bucket ORDER BY vec_id) AS rn FROM banded)
      |  WHERE rn <= 1024),
      |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id
      |  FROM banded q JOIN capped c USING (band, bucket)
      |  WHERE q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id),
      |scored AS (SELECT query_id, cand.vec_id,
      |    round(
      |      list_sum(list_transform(list_zip(eq.embedding, ec.embedding),
      |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(eq.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(ec.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM cand
      |  JOIN embeddings eq ON eq.vec_id = cand.query_id
      |  JOIN embeddings ec ON ec.vec_id = cand.vec_id)
      |SELECT query_id, vec_id, cosine, knn_rank FROM (
      |  SELECT query_id, vec_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, vec_id) AS knn_rank
      |  FROM scored)
      |WHERE knn_rank <= 5 ORDER BY query_id, knn_rank""".stripMargin

  /** Random-projection (JL) top-k ([[Similarity.projectedCosineTopK]]):
    * the corpus is reduced 64 -> 16 dims against the portable plane grid,
    * then exact cosine top-k runs in the projected space. The oracle
    * replays the projection and the projected-space scoring end to end. */
  private def q103(s: SparkSession, d: String): DataFrame =
    Similarity.projectedCosineTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  private val q103Sql =
    """WITH proj AS (SELECT vec_id,
      |    list_transform(range(0, 16), p ->
      |      list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0))) AS pv
      |  FROM embeddings),
      |q AS (SELECT pv AS qv FROM proj WHERE vec_id = 0)
      |SELECT vec_id, round(
      |    list_sum(list_transform(list_zip(pv, qv), z -> z[1] * z[2])) /
      |    (sqrt(list_sum(list_transform(pv, x -> x * x))) *
      |     sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS proj_cosine
      |FROM proj, q WHERE vec_id <> 0
      |ORDER BY proj_cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Semantic dedup ([[Similarity.semanticDedup]]): drop every vector with
    * a lower-id LSH-bucket-mate at cosine >= 0.4; the kept rows are the
    * semantically deduplicated corpus. The oracle replays the whole
    * pipeline — portable hyperplane signatures, banding, candidate pairs,
    * exact cosine verify, and the one-pass drop rule. */
  private def q101(s: SparkSession, d: String): DataFrame =
    Similarity.semanticDedup(Tables.embeddings(s, d), threshold = 0.4)
      .orderBy(col("vec_id"))

  private val q101Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM banded a JOIN banded b USING (band, bucket)
      |  WHERE a.vec_id < b.vec_id),
      |removed AS (SELECT DISTINCT vec_b AS vec_id FROM (
      |  SELECT c.vec_a, c.vec_b,
      |    round(
      |      list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(ea.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(eb.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM cand c
      |  JOIN embeddings ea ON ea.vec_id = c.vec_a
      |  JOIN embeddings eb ON eb.vec_id = c.vec_b)
      |WHERE cosine >= 0.4)
      |SELECT e.vec_id, r.vec_id IS NULL AS kept
      |FROM embeddings e LEFT JOIN removed r ON e.vec_id = r.vec_id
      |ORDER BY e.vec_id""".stripMargin

  /** Product-quantization ADC top-k ([[graft.ops.Pq.pqTopK]]): vectors
    * compress to m=8 byte codes against deterministic per-subspace
    * codebooks; the query scores via one broadcast m x 16 lookup table.
    * Like q44's IVF, the k-means training isn't SQL-expressible, so the
    * oracle is GENERATED at verify time ([[q98Oracle]]): the same
    * deterministic trainer plus a pure-Scala encode/ADC replay (the
    * PqSpec discipline) derives the expected rows from the data at the
    * verified SF — no pinned snapshot. */
  private def q98(s: SparkSession, d: String): DataFrame =
    graft.ops.Pq.pqTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  /** IVF-PQ ([[graft.ops.Pq.ivfPqTopK]]): coarse cells prune the corpus
    * to nprobe cells, then PQ codes of the residuals score via per-cell
    * ADC tables — the cell-id + m-bytes layout of a production vector
    * store. Oracle generated at verify time like q44/q98
    * ([[q100Oracle]]). */
  private def q100(s: SparkSession, d: String): DataFrame =
    graft.ops.Pq.ivfPqTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  // ---- generated IVF/PQ oracles ------------------------------------------
  // The k-means training is not SQL-expressible, so these oracles are
  // derived at verify time: the SAME deterministic trainers produce the
  // centroids/codebooks (fixed init, partition-id-bucketed merge — their
  // exactness and determinism are pinned by PqSpec/SimilaritySpec), and
  // a PURE-SCALA scalar replay of assignment, probing, encoding and
  // scoring — independent of the distributed scoring path under test —
  // produces the expected rows for the data at the verified SF. The
  // emitted SQL is a VALUES list COMPUTED per SF, so the oracle holds at
  // sf0.001/0.01/0.1 alike. The collect is oracle-generation only and is
  // bounded by the embeddings table (the corpus's small side).

  /** Scalar twin of the CosineSimExpr kernel: same fused loop, same
    * summation order, so the raw double is bit-identical. */
  private def scalarCosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** HALF_UP at 6 dp — the BigDecimal twin of Spark's round(). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Squared distance of a codebook centroid to a float slice, in the
    * exact summation order of the encode/ADC fold. */
  private def sliceD2(cent: Array[Double], v: Array[Float], off: Int): Double = {
    var d = 0.0; var i = 0
    while (i < cent.length) {
      val x = v(off + i) - cent(i); d += x * x; i += 1
    }
    d
  }

  /** First-min argmin over a codebook (ties take the lowest code, the
    * array_position semantics of Pq.encode). */
  private def argminCode(books: Array[Array[Double]], v: Array[Float],
      off: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < books.length) {
      val d = sliceD2(books(c), v, off)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def collectVecs(s: SparkSession, d: String): Array[(Long, Array[Float])] = {
    import s.implicits._
    Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
  }

  private def valuesPin(rows: Seq[(Long, Double)], valueCol: String,
      orderSql: String): String =
    rows.map { case (id, v) =>
      s"  (CAST($id AS BIGINT), CAST($v AS DOUBLE))"
    }.mkString("SELECT * FROM (VALUES\n", ",\n",
      s"\n) t(vec_id, $valueCol) $orderSql")

  /** q44 expected rows: trained coarse centroids + scalar replay of cell
    * probing and exact-cosine scoring (ivfTopK's cells=16/nprobe=4). */
  private def q44Oracle(s: SparkSession, d: String): String = {
    val embSel = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = Similarity.kMeansCentroids(embSel, k = 16, iters = 3)
    val vecs = collectVecs(s, d)
    val qv = vecs.find(_._1 == 0L).get._2
    val probed = centroids.indices.sortBy { c =>
      sliceD2(centroids(c), qv, 0)
    }.take(4).toSet
    val top = vecs.iterator
      .filter { case (id, v) =>
        id != 0L && probed.contains(Similarity.nearestCentroid(v, centroids))
      }
      .map { case (id, v) => (id, round6(scalarCosine(v, qv))) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(10)
    valuesPin(top, "cosine", "ORDER BY cosine DESC, vec_id")
  }

  /** q98 expected rows: trained PQ codebooks + scalar encode/ADC replay
    * (pqTopK's m=8, codebookSize=16). */
  private def q98Oracle(s: SparkSession, d: String): String = {
    val embSel = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val books = graft.ops.Pq.trainCodebooks(embSel, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d)
    val q = vecs.find(_._1 == 0L).get._2
    val top = vecs.iterator.filter(_._1 != 0L).map { case (id, v) =>
      var approx = 0.0
      var j = 0
      while (j < books.length) {
        val code = argminCode(books(j), v, j * sub)
        approx += sliceD2(books(j)(code), q, j * sub)
        j += 1
      }
      (id, round6(approx))
    }.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
    valuesPin(top, "approx_d2", "ORDER BY approx_d2, vec_id")
  }

  /** q100 expected rows: coarse cells + residual codebooks from the same
    * trainers, then scalar probing/encode/per-cell-ADC replay (ivfPqTopK's
    * cells=8/nprobe=2/m=8/codebookSize=16). The residual training input
    * shares the embedding read's partitioning, which the bucketed merge
    * order depends on. */
  private def q100Oracle(s: SparkSession, d: String): String = {
    import s.implicits._
    val embSel = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val coarse = Similarity.kMeansCentroids(embSel, k = 8, iters = 3)
    val cs = coarse
    val resDf = embSel.as[(Long, Array[Float])].map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, cs)
      (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
    }.toDF("vec_id", "embedding")
    val books = graft.ops.Pq.trainCodebooks(resDf, m = 8, codebookSize = 16,
      kmeansIters = 3)
    val sub = books.head.head.length
    val vecs = collectVecs(s, d)
    val qv = vecs.find(_._1 == 0L).get._2
    val probed = coarse.indices.sortBy { c =>
      sliceD2(coarse(c), qv, 0)
    }.take(2)
    // per-(cell, subspace) ADC rows against the query residual, exactly
    // as ivfPqTopK builds them (query residual re-quantized to float)
    def adc(c: Int, j: Int, code: Int): Double = {
      var dd = 0.0; var i = 0
      val cent = books(j)(code)
      while (i < sub) {
        val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
        val diff = qr - cent(i); dd += diff * diff; i += 1
      }
      dd
    }
    val top = vecs.iterator.filter(_._1 != 0L).flatMap { case (id, v) =>
      val c = Similarity.nearestCentroid(v, coarse)
      if (!probed.contains(c)) None
      else {
        val res = Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
        var approx = 0.0
        var j = 0
        while (j < books.length) {
          val code = argminCode(books(j), res, j * sub)
          approx += adc(c, j, code)
          j += 1
        }
        Some((id, round6(approx)))
      }
    }.toSeq.sortBy { case (id, dd) => (dd, id) }.take(10)
    valuesPin(top, "approx_d2", "ORDER BY approx_d2, vec_id")
  }

  /** Array scalar functions over the embedding column. */
  private def q22(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        round(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"),
        round(
          aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double"))
            / size(col("embedding")), 6).as("mean_val"))
      .orderBy(col("vec_id"))

  private val q22Sql =
    """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
      | CAST(embedding[1] AS DOUBLE) AS first_val,
      | round(sqrt(list_sum(list_transform(embedding,
      |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
      | round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
      |   / len(embedding), 6) AS mean_val
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Exact brute-force cosine top-10 against vec_id=0's embedding. */
  private def q37(s: SparkSession, d: String): DataFrame =
    Similarity.cosineTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  private val q37Sql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT vec_id,
      |  list_sum(list_transform(list_zip(embedding, qe),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
      |  sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
      |  sqrt(list_sum(list_transform(qe,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n2
      |  FROM embeddings, q WHERE vec_id <> 0)
      |SELECT vec_id, round(dot / (n1 * n2), 6) AS cosine FROM s
      |ORDER BY round(dot / (n1 * n2), 6) DESC, vec_id LIMIT 10""".stripMargin

  /** LSH-bucketed approximate nearest neighbours. The hyperplanes are the
    * engine-portable integer grid (Similarity.planeWeight), so the DuckDB
    * oracle replays the exact signature, banding, candidate set and
    * scoring; recall vs q37 is additionally asserted in SimilaritySpec. */
  private def q39(s: SparkSession, d: String): DataFrame =
    Similarity.annTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  // w(p,i) = ((p*64+i)*2654435761 mod 1e9+7 mod 2001 - 1000)/1000 with
  // DuckDB's 1-based lambda index i == Spark's 0-based i + 1.
  private val q39Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |qb AS (SELECT band, bucket FROM banded WHERE vec_id = 0),
      |cand AS (SELECT DISTINCT banded.vec_id
      |  FROM banded JOIN qb USING (band, bucket) WHERE banded.vec_id <> 0),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(dot / (n1 * n2), 6) AS cosine FROM (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, qe),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(e.embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
      |    sqrt(list_sum(list_transform(qe,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n2
      |  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, q)
      |ORDER BY round(dot / (n1 * n2), 6) DESC, vec_id LIMIT 10""".stripMargin

  /** IVF (k-means inverted file) approximate top-k: nprobe cells scored
    * instead of the full corpus. Lloyd iterations aren't SQL-expressible,
    * so the oracle is generated at verify time ([[q44Oracle]]) from the
    * deterministic trainer (fixed init, partition-ordered float merges)
    * plus a scalar probing/scoring replay; exactness vs brute force with
    * nprobe=cells is asserted in SimilaritySpec. */
  private def q44(s: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  /** Embedding-cosine near-duplicate pairs (exact baseline): one side of
    * the self-join is broadcast (the embedding table is the small,
    * dimension-like input here), so there is NO shuffle — each task scans
    * its partition against the broadcast side. At corpus scale this exact
    * op is the verification stage; candidate generation is the q39 LSH /
    * q44 IVF path. */
  private def q48(s: SparkSession, d: String): DataFrame =
    Similarity.cosinePairs(Tables.embeddings(s, d), threshold = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))

  private val q48Sql =
    """SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    round(
      |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(a.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(b.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** Multi-probe ANN: the query also visits every band bucket at Hamming
    * distance 1 (one flipped bit per probe), so recall no longer depends
    * on hyperplane luck — the corpus is bucketed once, only the broadcast
    * query side expands. The oracle replays the probe expansion with an
    * explicit XOR VALUES list. */
  private def q70(s: SparkSession, d: String): DataFrame =
    Similarity.annTopK(Tables.embeddings(s, d), queryVecId = 0L, k = 10,
      multiProbe = true)

  private val q70Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |qb AS (SELECT DISTINCT band, xor(bucket, CAST(p.f AS BIGINT)) AS bucket
      |  FROM banded, (VALUES (0), (1), (2), (4), (8)) p(f)
      |  WHERE vec_id = 0),
      |cand AS (SELECT DISTINCT banded.vec_id
      |  FROM banded JOIN qb USING (band, bucket) WHERE banded.vec_id <> 0),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, round(dot / (n1 * n2), 6) AS cosine FROM (
      |  SELECT e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, qe),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(e.embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
      |    sqrt(list_sum(list_transform(qe,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n2
      |  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, q)
      |ORDER BY round(dot / (n1 * n2), 6) DESC, vec_id LIMIT 10""".stripMargin

  /** The scale-safe near-dup composition: LSH band-bucket candidate
    * generation + exact cosine verification, fully distributed (no driver
    * collect — contrast q48's bounded exact baseline). The oracle replays
    * the whole pipeline: portable planes, banding, the candidate
    * self-join, and the scoring. */
  private def q66(s: SparkSession, d: String): DataFrame =
    Similarity.lshNearDupPairs(Tables.embeddings(s, d), threshold = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))

  private val q66Sql =
    """WITH sig AS (SELECT vec_id, embedding,
      |    list_transform(range(0, 16), p ->
      |      CASE WHEN list_sum(list_transform(embedding, (x, i) ->
      |        CAST(x AS DOUBLE) *
      |        ((CAST(p*64 + i AS BIGINT) * 2654435761 % 1000000007) % 2001
      |         - 1000) / 1000.0)) > 0
      |      THEN 1 ELSE 0 END) AS bits
      |  FROM embeddings),
      |banded AS (SELECT vec_id, b.range AS band,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        bits[b.range*4+1 : b.range*4+4]),
      |      (a, v) -> a * 2 + v) AS bucket
      |  FROM sig, range(0, 4) b),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM banded a JOIN banded b USING (band, bucket)
      |  WHERE a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cosine FROM (
      |  SELECT c.vec_a, c.vec_b,
      |    round(
      |      list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |      (sqrt(list_sum(list_transform(ea.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |       sqrt(list_sum(list_transform(eb.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      |  FROM cand c
      |  JOIN embeddings ea ON ea.vec_id = c.vec_a
      |  JOIN embeddings eb ON eb.vec_id = c.vec_b)
      |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** Symmetric int8 quantization report ([[graft.ops.Quantize]]):
    * per-vector scale, exact integer checksum of the quantized codes,
    * saturation count and max reconstruction error — all DOUBLE-pinned
    * per-row arithmetic the oracle replays exactly. */
  private def q82(s: SparkSession, d: String): DataFrame =
    graft.ops.Quantize.quantizationReport(Tables.embeddings(s, d))

  private val q82Sql =
    """WITH q AS (SELECT vec_id,
      |    list_max(list_transform(embedding,
      |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
      |    embedding FROM embeddings),
      |qq AS (SELECT vec_id, scale, embedding,
      |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
      |      ELSE greatest(-127, least(127,
      |        CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT))) END) AS qv
      |  FROM q)
      |SELECT vec_id, round(scale, 9) AS scale,
      |  CAST(list_sum(qv) AS BIGINT) AS qsum,
      |  CAST(len(list_filter(qv, v -> abs(v) = 127)) AS INT) AS n_saturated,
      |  round(list_max(list_transform(list_zip(embedding, qv),
      |    p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale))), 9)
      |    AS max_err
      |FROM qq ORDER BY vec_id""".stripMargin
}

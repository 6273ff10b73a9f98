package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the compression end of the ANN ladder
  * (brute cosine → LSH → IVF → PQ): split the d-dim embedding into `m`
  * subvectors, learn a small per-subspace codebook with the
  * deterministic k-means of [[Similarity.kMeansCentroids]], and encode
  * every vector as `m` small integer codes (here: m bytes at
  * codebookSize <= 256). Queries score via ADC (asymmetric distance
  * computation): ONE m x codebookSize table of exact partial squared
  * distances from the query to every centroid is precomputed on the
  * driver and broadcast as a literal; a vector's approximate distance
  * is then `m` table lookups — no float dot products in the scan at
  * all. At 100 TB this is the operator that makes exhaustive scans
  * affordable: 256-dim float vectors (1 KB) become m=8 bytes, and the
  * scan is table lookups over those bytes.
  *
  * Everything is deterministic: k-means init and merge order are fixed
  * (see kMeansCentroids), argmin ties break to the lowest code, and the
  * ADC table is a pure function of query + codebooks.
  */
object Pq {

  /** Per-subspace codebooks: codebooks(j) is a codebookSize x (d/m)
    * matrix learned on subvector slice j of every embedding.
    *
    * All m subspaces train SIMULTANEOUSLY: one Spark job per Lloyd
    * iteration accumulates the m disjoint (sums, counts) blocks, instead
    * of m independent k-means runs (m x iters sequential jobs — at m=8
    * that was the dominant cost of pqTopK). The arithmetic is
    * bit-identical to training each subspace alone: per-row accumulation
    * order, the partition-id-bucketed two-level merge, and the final
    * divisions all match [[Similarity.kMeansCentroids]] exactly, so
    * pinned oracles survive the fusion. */
  def trainCodebooks(emb: DataFrame, m: Int, codebookSize: Int,
      kmeansIters: Int = 3): Array[Array[Array[Double]]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val k = codebookSize
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      // scanned once per Lloyd iteration + once for init — cache the
      // projection for the call, release before returning (the suite's
      // cache-leak guardrail asserts nothing persists past a query)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val first = vecs.orderBy(col("vec_id")).limit(k).collect()
    val dim = first.headOption.map(_._2.length).getOrElse(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // init: subspace j's codebook = slice j of the first k rows by vec_id
    // (identical to kMeansCentroids' init on the pre-sliced column)
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      first.map(r => Array.tabulate(sub)(i => r._2(j * sub + i).toDouble))
    }
    // in-place, order-sensitive partial merge (left operand accumulates)
    def merge(a: (Array[Array[Array[Double]]], Array[Array[Long]]),
        b: (Array[Array[Array[Double]]], Array[Array[Long]])): (Array[Array[Array[Double]]], Array[Array[Long]]) = {
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          a._2(j)(c) += b._2(j)(c)
          var i = 0
          while (i < sub) { a._1(j)(c)(i) += b._1(j)(c)(i); i += 1 }
          c += 1
        }
        j += 1
      }
      a
    }
    (0 until kmeansIters).foreach { _ =>
      val bs = books // closure capture
      val partials = vecs.rdd.mapPartitionsWithIndex { (pi, it) =>
        val sums = Array.tabulate(m)(_ => Array.ofDim[Double](k, sub))
        val counts = Array.ofDim[Long](m, k)
        val slice = new Array[Float](sub)
        it.foreach { case (_, v) =>
          var j = 0
          while (j < m) {
            var i = 0
            while (i < sub) { slice(i) = v(j * sub + i); i += 1 }
            val c = Similarity.nearestCentroid(slice, bs(j))
            counts(j)(c) += 1
            i = 0
            while (i < sub) { sums(j)(c)(i) += slice(i); i += 1 }
            j += 1
          }
        }
        Iterator.single((pi, (sums, counts)))
      }
      val bucketTotals = partials
        .map { case (pi, p) => (pi >>> 5, (pi, p)) }
        .groupByKey()
        .mapValues(_.toArray.sortBy(_._1).map(_._2).reduceLeft(merge))
        .collect().sortBy(_._1)
      val totals = bucketTotals.map(_._2).reduceLeftOption(merge)
      books = totals match {
        case None => books
        case Some((sums, counts)) =>
          Array.tabulate(m) { j =>
            books(j).zipWithIndex.map { case (old, c) =>
              if (counts(j)(c) == 0) old
              else sums(j)(c).map(_ / counts(j)(c))
            }
          }
      }
    }
    vecs.unpersist()
    books
  }

  /** Code column: array of m integer codes (0-based), code j = argmin
    * over the subspace-j codebook of the exact squared distance. Ties
    * take the lowest code (array_position finds the FIRST minimum). */
  private[graft] def encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    array(Array.tabulate(m) { j =>
      val s = slice(v, j * sub + 1, sub)
      val dists = array(codebooks(j).map { cent =>
        aggregate(zip_with(s, typedLit(cent.toSeq),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (a, x) => a + x)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
  }

  /** Approximate top-k nearest (squared L2) to `queryVecId` via ADC over
    * PQ codes. Output: vec_id, approx_d2 (ascending). The query row is
    * excluded. One scan to encode, one TakeOrderedAndProject — the
    * codebook training is the only iterative part. */
  def pqTopK(emb: DataFrame, queryVecId: Long, k: Int, m: Int = 8,
      codebookSize: Int = 16, kmeansIters: Int = 3): DataFrame = {
    val codebooks = trainCodebooks(emb, m, codebookSize, kmeansIters)
    val sub = codebooks.head.head.length
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    require(q.length == m * sub, s"query dim ${q.length} != ${m * sub}")
    // ADC table: adc(j)(c) = exact ||q_j - centroid_{j,c}||^2
    val adc: Seq[Seq[Double]] = Seq.tabulate(m) { j =>
      Seq.tabulate(codebookSize) { c =>
        var d = 0.0; var i = 0
        val cent = codebooks(j)(c)
        while (i < sub) {
          val diff = q(j * sub + i) - cent(i); d += diff * diff; i += 1
        }
        d
      }
    }
    // fused native encode+lookup kernel: one primitive pass per row where
    // the HOF twin ([[adcScoreHof]], kept for the parity spec) built an
    // m x codebookSize interpreted expression tree per row
    emb.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.pqAdcScore(
          col("embedding"), lit(0), codebooks,
          Array(adc.map(_.toArray).toArray)), 6).as("approx_d2"))
      .orderBy(col("approx_d2"), col("vec_id"))
      .limit(k)
  }

  /** HOF reference formulation of the fused ADC scoring (kept for the
    * native-vs-expression parity spec, the [[graft.ops.Dedup]] pattern):
    * encode to codes, then look each code up in the (per-cell) ADC table
    * and sum left-to-right. */
  private[graft] def adcScoreHof(v: Column, cellAdc: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    aggregate(
      zip_with(encode(v, codebooks), cellAdc,
        (c, row) => element_at(row, c + 1)),
      lit(0.0), (a, x) => a + x)

  /** IVF-PQ: the production composition of [[Similarity.ivfTopK]]'s
    * inverted file and PQ residual codes — coarse k-means cells prune
    * the corpus to `nprobe` cells, and within them vectors are scored
    * from PQ codes of their RESIDUAL (v - cell centroid) via a per-cell
    * ADC table computed against the query's own residual. This is the
    * layout a 100 TB vector store actually keeps on disk: cell id + m
    * bytes per vector; a query touches nprobe cells and does table
    * lookups only. One shared residual codebook across cells (classic
    * IVFADC).
    *
    * Output: vec_id, approx_d2 ascending over the probed cells. All
    * stages deterministic (fixed k-means init/merge order, stable
    * cell-sort tiebreak, first-min code ties). */
  def ivfPqTopK(emb: DataFrame, queryVecId: Long, k: Int, cells: Int = 8,
      nprobe: Int = 2, m: Int = 8, codebookSize: Int = 16,
      kmeansIters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
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
    val codebooks = trainCodebooks(assigned, m, codebookSize, kmeansIters)
    val sub = codebooks.head.head.length
    val q = vecs.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).as[Array[Float]].collect()
    require(q.nonEmpty, s"query vec_id $queryVecId not found")
    val qv = q.head
    // stable sort: equal distances tie-break to the lower cell id
    val probed = coarse.indices.sortBy { c =>
      var d = 0.0; var i = 0
      while (i < qv.length) { val x = qv(i) - coarse(c)(i); d += x * x; i += 1 }
      d
    }.take(nprobe)
    // per-cell ADC tables against the query residual; unprobed cells get
    // a zero table (filtered out before scoring, never read)
    val adc: Seq[Seq[Seq[Double]]] = Seq.tabulate(cells) { c =>
      if (!probed.contains(c)) Seq.fill(m)(Seq.fill(codebookSize)(0.0))
      else Seq.tabulate(m) { j =>
        Seq.tabulate(codebookSize) { code =>
          var d = 0.0; var i = 0
          val cent = codebooks(j)(code)
          while (i < sub) {
            val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
            val diff = qr - cent(i); d += diff * diff; i += 1
          }
          d
        }
      }
    }
    val out = assigned
      .filter(col("cell").isInCollection(probed) &&
        col("vec_id") =!= queryVecId)
      // fused native encode+lookup (see pqTopK); the cell column selects
      // the per-cell ADC table inside the kernel
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.pqAdcScore(
          col("embedding"), col("cell"), codebooks,
          adc.map(_.map(_.toArray).toArray).toArray), 6).as("approx_d2"))
      .orderBy(col("approx_d2"), col("vec_id"))
      .limit(k)
      // k rows; materialize so the cached training inputs can be released
      .localCheckpoint(true)
    assigned.unpersist()
    vecs.unpersist()
    out
  }
}

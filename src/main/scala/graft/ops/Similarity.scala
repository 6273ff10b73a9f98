package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Vector-similarity search over an embedding column (Array[Float]).
  *
  * Scale design: brute-force cosine is the exact baseline (one narrow pass,
  * TakeOrderedAndProject top-k — no full sort, no shuffle besides the final
  * k-row reduction). The LSH path buckets vectors by hyperplane signature so
  * a 100 TB corpus only scores candidates sharing a bucket: the join
  * shuffles on the signature key instead of broadcasting the whole corpus.
  * The IVF path clusters with distributed k-means and probes only the cells
  * nearest the query.
  *
  * The LSH hyperplanes are an engine-portable integer-derived grid (see
  * [[planeWeight]]) so the full ANN pipeline is reproducible in the DuckDB
  * oracle, not just spec-checked.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column (double). */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k by cosine similarity against the embedding of
    * `queryVecId`. The query vector is a 1-row broadcast; ties break on
    * vec_id; similarity is rounded so the ordering is reproducible across
    * engines. */
  def cosineTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("qe")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Metadata-filtered exact top-k (the "filtered vector search" every
    * production retrieval stack needs: top-k among vectors satisfying a
    * structured predicate, e.g. one tenant / language / date range).
    * The predicate is applied BEFORE any vector arithmetic, on the bare
    * input relation, so Catalyst pushes it into the parquet scan
    * (PushedFilters) — only the filtered slice is ever read or scored,
    * which at 100 TB is the difference between scanning a partition and
    * scanning the corpus (pre-filtering beats post-filtering whenever
    * the predicate is selective; with partition- or z-ordered layout on
    * the filter column, [[Layout]], the scan skips whole files). The
    * query vector is a 1-row broadcast and the top-k is
    * TakeOrderedAndProject — no sort, no extra shuffle, exactly
    * [[cosineTopK]]'s plan over a smaller scan. */
  def filteredCosineTopK(emb: DataFrame, pred: Column, queryVecId: Long,
      k: Int, metaCols: Seq[String] = Seq("label")): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    emb.filter(pred)
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id") +: metaCols.map(col) :+
        round(VectorFunctions.cosine(col("embedding"), col("qe")), 6)
          .as("cosine"): _*)
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Engine-portable pseudo-random plane weight in [-1, 1]:
    * `((k+1)*2654435761 mod 1e9+7 mod 2001 - 1000) / 1000` for flat index
    * k = plane*dim + i. Pure integer arithmetic, so the DuckDB oracle
    * derives the identical planes. */
  def planeWeight(k: Int): Double =
    (((k + 1L) * 2654435761L % 1000000007L) % 2001L - 1000L) / 1000.0

  /** Deterministic portable hyperplanes (numPlanes x dim). */
  def portablePlanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(numPlanes)(p => Seq.tabulate(dim)(i => planeWeight(p * dim + i)))

  /** Hyperplane LSH signature: array of numPlanes 0/1 longs (sign of
    * dot(v, plane)). The planes are literals, so the whole signature is one
    * codegen'd projection. */
  def lshBits(v: Column, planes: Seq[Seq[Double]]): Column =
    array(planes.map { p =>
      when(dot(v, typedLit(p)) > 0, lit(1L)).otherwise(lit(0L))
    }: _*)

  /** Deterministic distributed k-means (Lloyd) over the embedding column:
    * init = the k lowest vec_ids; each iteration is ONE pass — a
    * mapPartitions stage accumulating per-cell sums/counts (k x dim
    * doubles per partition), then a two-level reduce: partials fold
    * WITHIN fixed 32-partition buckets on the executors (sorted by
    * partition id) and the bucket results fold on the driver (sorted by
    * bucket id). The merge tree is a pure function of the partition
    * count, so float summation is reproducible run-to-run, and the
    * driver receives ceil(P/32) partials instead of P — at 10^5 input
    * partitions the flat collect would be a driver hotspot; this stays
    * at ~3k tiny rows. Driver state is only k*dim doubles. */
  def kMeansCentroids(emb: DataFrame, k: Int, iters: Int = 5): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    var centroids: Array[Array[Double]] = vecs
      .orderBy(col("vec_id")).limit(k).collect()
      .map(_._2.map(_.toDouble))
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    // in-place, order-sensitive partial merge (left operand accumulates)
    def merge(a: (Array[Array[Double]], Array[Long]),
        b: (Array[Array[Double]], Array[Long])): (Array[Array[Double]], Array[Long]) = {
      var j = 0
      while (j < k) {
        a._2(j) += b._2(j)
        var i = 0
        while (i < dim) { a._1(j)(i) += b._1(j)(i); i += 1 }
        j += 1
      }
      a
    }
    (0 until iters).foreach { _ =>
      val cs = centroids // closure capture
      val partials = vecs.rdd.mapPartitionsWithIndex { (pi, it) =>
        val sums = Array.ofDim[Double](k, dim)
        val counts = new Array[Long](k)
        it.foreach { case (_, v) =>
          val c = nearestCentroid(v, cs)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        Iterator.single((pi, (sums, counts)))
      }
      val bucketTotals = partials
        .map { case (pi, p) => (pi >>> 5, (pi, p)) }
        .groupByKey()
        .mapValues(_.toArray.sortBy(_._1).map(_._2).reduceLeft(merge))
        .collect().sortBy(_._1)
      val (sums, counts) = bucketTotals.map(_._2).reduceLeftOption(merge)
        .getOrElse((Array.ofDim[Double](k, dim), new Array[Long](k)))
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old
        else sums(j).map(_ / counts(j))
      }
    }
    centroids
  }

  private[graft] def nearestCentroid(v: Array[Float], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      val cent = cs(c)
      while (i < cent.length) {
        val diff = v(i) - cent(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF approximate top-k: vectors are bucketed into k-means cells; only
    * the `nprobe` cells nearest the query are scored exactly. The scale
    * path for 100 TB embedding search: the inverted file turns a full
    * scan into a handful of cell scans. */
  def ivfTopK(
      emb: DataFrame,
      queryVecId: Long,
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      kmeansIters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // one read for training, assignment and the query lookup
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = kMeansCentroids(vecs, cells, kmeansIters)
    val cs = centroids
    val assigned = vecs
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, nearestCentroid(v, cs)) }
      .toDF("vec_id", "embedding", "cell")
    val qRows = vecs.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).as[Array[Float]].collect()
    require(qRows.nonEmpty, s"query vec_id $queryVecId not found")
    val qVec = qRows.head
    val probeCells = centroids.indices
      .sortBy { c =>
        var d = 0.0; var i = 0
        while (i < centroids(c).length) {
          val diff = qVec(i) - centroids(c)(i); d += diff * diff; i += 1
        }
        d
      }
      .take(nprobe).toSet
    val q = vecs.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    val out = assigned
      .filter(col("cell").isInCollection(probeCells) &&
        col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("qe")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
      // k rows; materialize eagerly so the cached training/assignment input
      // can be released — otherwise every call leaks a persisted DataFrame
      // for the lifetime of the session
      .localCheckpoint(true)
    vecs.unpersist()
    out
  }

  /** Exact all-pairs cosine similarity above a threshold.
    *
    * The whole (small-side) table is broadcast and each partition scores
    * its rows against it in a tight primitive loop — the same work a
    * codegen'd broadcast nested-loop join would do, but without the
    * per-pair array allocations of expression-tree HOFs (measured 60x:
    * 51 s -> <1 s for 2M pairs at sf0.1). Summation order matches the
    * `aggregate`-fold (left-to-right) exactly, and the final round/filter
    * stay in Spark expressions so engine-parity of rounding is untouched.
    * At corpus scale the broadcast side must be bounded: this exact op is
    * the verification stage after LSH/IVF candidate generation
    * ([[annTopK]] / [[lshNearDupPairs]]), not the full-corpus scan. The
    * bound is ENFORCED: inputs above `maxRows` fail fast with a named
    * error instead of OOMing the driver — route large corpora through
    * [[lshNearDupPairs]], which never collects.
    */
  def cosinePairs(
      emb: DataFrame,
      threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    // one scan: the limited collect IS the broadcast payload when in bounds
    val limited = vecs.limit(math.min(maxRows + 1, Int.MaxValue).toInt).collect()
    require(limited.length <= maxRows,
      s"cosinePairs: input exceeds maxRows=$maxRows vectors; this exact " +
        "all-pairs op broadcasts the whole input to every task and is a " +
        "verification stage only — generate candidates with " +
        "lshNearDupPairs/annTopK first, or raise maxRows deliberately")
    val all = limited.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    // raw-cosine prefilter slightly below the rounded threshold; the
    // authoritative filter below is on Spark's round(_, 6)
    val rawCut = threshold - 1e-6
    val pairs = vecs.mapPartitions { it =>
      val others = bc.value
      it.flatMap { case (ida, va) =>
        others.iterator
          .filter(_._1 > ida)
          .map { case (idb, vb) =>
            var dot = 0.0; var na = 0.0; var nb = 0.0
            var i = 0
            while (i < va.length) {
              val x = va(i).toDouble; val y = vb(i).toDouble
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
            (ida, idb, dot / (math.sqrt(na) * math.sqrt(nb)))
          }
          .filter(_._3 >= rawCut)
      }
    }.toDF("vec_a", "vec_b", "raw")
    pairs
      .select(col("vec_a"), col("vec_b"), round(col("raw"), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Banded LSH projection, ids only: (vec_id, band, bucket), one row per
    * band — the embedding does NOT travel with the banded rows, so the
    * candidate-generation shuffle moves 16 bytes per (vector, band) instead
    * of the 256-byte embedding payload. The signature is the native
    * single-pass kernel ([[graft.functions.LshBandBucketsExpr]]); the HOF
    * twin below ([[bandedSignaturesHof]]) pins its semantics, and the
    * DuckDB oracle replays the same integer-grid planes. */
  private[ops] def bandedIds(
      emb: DataFrame, numPlanes: Int, bands: Int, dim: Int): DataFrame =
    emb.select(col("vec_id"),
        posexplode(VectorFunctions.lshBandBuckets(
          col("embedding"), numPlanes, bands, dim)).as(Seq("band", "bucket")))

  /** Reference HOF formulation of the banded signature (slow path, spec
    * twin for the native kernel — not used in queries). */
  private[ops] def bandedSignaturesHof(
      emb: DataFrame, numPlanes: Int, bands: Int, dim: Int): DataFrame = {
    val planes = portablePlanes(numPlanes, dim)
    val r = numPlanes / bands
    emb.select(col("vec_id"), col("embedding"),
        lshBits(col("embedding"), planes).as("bits"))
      .select(col("vec_id"), col("embedding"),
        explode(transform(sequence(lit(0L), lit(bands - 1L)), b =>
          struct(b.as("band"),
            aggregate(slice(col("bits"), b * lit(r) + lit(1), lit(r)),
              lit(0L), (a, v) => a * lit(2L) + v).as("bucket")))).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Scale-safe embedding near-duplicate pairs: LSH candidate generation
    * composed with exact cosine verification, fully distributed — no
    * driver collect anywhere. Candidates come from a band-bucket
    * equi-self-join over (vec_id, band, bucket) rows only (shuffles on the
    * (band, bucket) key; never cartesian; no embedding payload), are
    * deduped BEFORE scoring so a pair sharing several bands is scored
    * once, and only then join the embeddings back (two equi-joins on
    * vec_id, AQE-broadcastable) to pay the exact cosine via the native
    * kernel. This is the 100 TB path that [[cosinePairs]] verifies at
    * small scale. */
  def lshNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val banded = bandedIds(emb, numPlanes, bands, dim)
    val cand = banded.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
      .join(banded.select(col("vec_id").as("vec_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    val ea = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val eb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosine(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** LSH approximate top-k: the bit signature is cut into `bands` bands of
    * `numPlanes/bands` bits, each folded to an integer bucket; any vector
    * sharing at least one band-bucket with the query becomes a candidate
    * and only candidates are scored exactly. More bands => higher recall,
    * more candidates — the recall/cost knob LSH buys at scale.
    *
    * `multiProbe = true` additionally visits every band bucket at Hamming
    * distance 1 from the query's (flip one bit per probe): recall stops
    * depending on hyperplane luck at the cost of `r` extra bucket lookups
    * per band — the probe list expands ONLY on the query side (a handful
    * of broadcast rows), the corpus is never re-bucketed. */
  def annTopK(
      emb: DataFrame,
      queryVecId: Long,
      k: Int,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64,
      multiProbe: Boolean = false): DataFrame = {
    val banded = bandedIds(emb, numPlanes, bands, dim)
    val r = numPlanes / bands
    val probes: Seq[Column] =
      if (multiProbe) lit(0L) +: Seq.tabulate(r)(j => lit(1L << j))
      else Seq(lit(0L))
    val qb = banded.filter(col("vec_id") === queryVecId)
      .select(col("band").as("qband"),
        explode(array(probes.map(p =>
          col("bucket").bitwiseXOR(p)): _*)).as("qbucket"))
      .dropDuplicates("qband", "qbucket")
    val candIds = banded.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(qb),
        col("band") === col("qband") && col("bucket") === col("qbucket"))
      .select(col("vec_id"))
      .dropDuplicates("vec_id")
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    candIds.join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorFunctions.cosine(col("embedding"), col("qe")), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Johnson–Lindenstrauss-style random projection to `outDim` dimensions:
    * component p of the output is dot(v, plane_p) against the same
    * engine-portable [[planeWeight]] grid the LSH path uses — [[lshBits]]
    * is exactly this projection with a sign quantizer on top. At corpus
    * scale this is the ANN *pre-reduction* step: a 64-float embedding
    * becomes 16 doubles, so every downstream shuffle/broadcast carries 4x
    * fewer vector bytes while inner products remain approximately
    * preserved (JL lemma). Pure codegen'd projection, zero shuffle. */
  def randomProject(emb: DataFrame, outDim: Int = 16, dim: Int = 64): DataFrame = {
    val planes = portablePlanes(outDim, dim)
    emb.select(col("vec_id"),
      array(planes.map(p => dot(col("embedding"), typedLit(p))): _*).as("pv"))
  }

  /** Exact cosine top-k computed IN THE PROJECTED SPACE of
    * [[randomProject]]: the corpus is reduced once, the query vector is a
    * 1-row broadcast, and the final answer is a TakeOrderedAndProject over
    * (vec_id, projected cosine). The approximation error vs full-dim
    * cosine is the JL distortion — bounded and dimension-tunable. */
  def projectedCosineTopK(
      emb: DataFrame,
      queryVecId: Long,
      k: Int,
      outDim: Int = 16,
      dim: Int = 64): DataFrame = {
    val projected = randomProject(emb, outDim, dim)
    val q = projected.filter(col("vec_id") === queryVecId)
      .select(col("pv").as("qv"))
    projected.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("pv"), col("qv")) /
          (l2Norm(col("pv")) * l2Norm(col("qv"))), 6).as("proj_cosine"))
      .orderBy(col("proj_cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch ANN kNN join — the production retrieval shape: EVERY query
    * vector gets its top-k corpus neighbors in one distributed job (the
    * single-query [[annTopK]] run as a set-to-set join). Both sides are
    * banded by the portable hyperplane LSH ([[bandedIds]], ids only — the
    * candidate shuffle carries 16 B/(vector, band), never embeddings);
    * candidates meet through a (band, bucket) equi-join, dedup BEFORE
    * scoring, then the embeddings join back on their id keys and the
    * per-query top-k is one `row_number` window over `query_id`.
    *
    * Scale: no broadcast of the corpus, no cartesian anywhere; the only
    * per-query state is the window's k-row frontier. A hot bucket (many
    * corpus vectors with one signature) widens the candidate set for
    * EVERY query in it — candidate volume is sum(bucket_q x bucket_c),
    * the two-sided version of the skew the one-sided generators cap —
    * so the corpus side keeps at most `corpusBucketCap` vectors per
    * (band, bucket), the FIRST ones in vec_id order (deterministic and
    * oracle-replayable as a row_number window; the window's sort rides
    * the same (band, bucket) shuffle the candidate join needs anyway).
    * The cap is a recall/cost lever, not exactness-neutral: a capped
    * bucket can hide a true neighbor behind `corpusBucketCap` lower-id
    * bucket-mates (both engines agree on the capped answer — the q109
    * oracle replays the cap). Size it to a few x the expected bucket
    * occupancy; duplicate-heavy corpora should exact-collapse first
    * (the q84 discipline). Cap sensitivity, MEASURED (round-13 SCALE
    * rows ann_knn_join vs ann_knn_join_cap256): 1024 -> 256 cuts the
    * 16x probe 9.4 -> 3.3 s — near-linear in the cap, so it is the
    * FIRST knob when this join is the bottleneck, traded directly
    * against tail recall. Ties break on (cosine desc, vec_id) with
    * cosine rounded to 6 dp so the ranking replays bit-identically in
    * the oracle. */
  def annKnnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64,
      corpusBucketCap: Int = 1024): DataFrame = {
    val qb = bandedIds(queries, numPlanes, bands, dim)
      .select(col("vec_id").as("query_id"), col("band"), col("bucket"))
    val cb = bandedIds(corpus, numPlanes, bands, dim)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket")).orderBy(col("vec_id"))))
      .filter(col("__rn") <= corpusBucketCap)
      .drop("__rn")
    val cand = cb.join(qb, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val qe = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val ce = corpus.select(col("vec_id"), col("embedding").as("ce"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cand.join(qe, Seq("query_id")).join(ce, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("qe"), col("ce")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ANN quality evaluation — recall@k of the banded-LSH kNN
    * ([[annKnnJoin]], same parameters and hot-bucket cap) against the
    * exact brute-force ranking, per query: (query_id, n_ann, n_hits)
    * with n_hits = |ANN top-k ∩ exact top-k|. Integer counts, both
    * rankings tie-broken on (cosine rounded to 6 dp desc, vec_id), so
    * the whole evaluation replays exactly in SQL — this is the
    * recall-monitoring query a production retrieval stack runs after
    * every index rebuild or ingest batch.
    *
    * Scale: the EXACT side is |queries| x |corpus| by construction (it
    * is the ground truth) — run it on a SAMPLED query set and size the
    * sample, not the corpus; the query set enters as a broadcast so the
    * corpus never shuffles for the scoring. */
  def annRecallAtK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64,
      corpusBucketCap: Int = 1024): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ann = annKnnJoin(queries, corpus, k, numPlanes, bands, dim,
        corpusBucketCap)
      .select(col("query_id"), col("vec_id"))
    val qe = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val exact = corpus.select(col("vec_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(qe))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("qe"), col("ce")), 6).as("cosine"))
      .withColumn("__r", row_number().over(
        W.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("__r") <= k)
      .select(col("query_id"), col("vec_id"))
    val nAnn = ann.groupBy(col("query_id")).agg(count(lit(1)).as("n_ann"))
    val nHits = ann.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    queries.select(col("vec_id").as("query_id"))
      .join(nAnn, Seq("query_id"), "left")
      .join(nHits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_ann"), lit(0L)).as("n_ann"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Semantic deduplication (SemDeDup-style, Abbas et al. 2023): prune the
    * corpus of vectors that are near-duplicates IN EMBEDDING SPACE of an
    * earlier (lower-id) vector. Candidates come from the same LSH band
    * buckets as [[lshNearDupPairs]] — never all-pairs — and a vector is
    * dropped when any lower-id bucket-mate scores `cosine >= threshold`.
    * The keep/drop rule is a single pass ("drop if a lower-id near-dup
    * exists"), not the order-dependent greedy chain, so it is deterministic,
    * SQL-replayable, and embarrassingly parallel.
    *
    * Output: every vec_id with its `kept` decision (the kept rows are the
    * deduplicated corpus). Scale: one banding pass over the corpus, the
    * candidate shuffle carries ids only, and the final decision is one
    * equi-join on vec_id — no stage widens beyond the LSH candidate set.
    */
  def semanticDedup(
      emb: DataFrame,
      threshold: Double,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val removed = lshNearDupPairs(emb, threshold, numPlanes, bands, dim)
      .select(col("vec_b").as("vec_id"))
      .dropDuplicates("vec_id")
      .withColumn("rm", lit(true))
    emb.select(col("vec_id"))
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), (!coalesce(col("rm"), lit(false))).as("kept"))
  }
}

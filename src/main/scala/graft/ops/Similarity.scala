package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity search over an embedding column (Array[Float]).
  *
  * Scale design: brute-force cosine is the exact baseline (one narrow pass,
  * TakeOrderedAndProject top-k — no full sort, no shuffle besides the final
  * k-row reduction). The LSH path buckets vectors by random-hyperplane
  * signature so a 100 TB corpus only scores candidates sharing a bucket:
  * the join shuffles on the signature key instead of broadcasting the
  * whole corpus.
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
        round(cosine(col("embedding"), col("qe")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random unit-free hyperplanes (seeded; pure
    * function of (plane, dim) so executors and tests agree). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH signature: one bit per plane
    * (sign of dot(v, plane)), rendered as a bit string bucket key. */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    concat_ws("", planes.map { p =>
      when(dot(v, typedLit(p.map(_.toFloat))) > 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Deterministic distributed k-means (Lloyd) over the embedding column:
    * init = the k lowest vec_ids; assignment in a typed map (tight loop,
    * centroids broadcast in the closure); update = posexplode ->
    * groupBy(cluster, dim) avg -> collect the tiny k x dim table per
    * iteration. Driver state is only k*dim doubles. */
  def kMeansCentroids(emb: DataFrame, k: Int, iters: Int = 5): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
    var centroids: Array[Array[Double]] = vecs
      .orderBy(col("vec_id")).limit(k).collect()
      .map(_._2.map(_.toDouble).toArray)
    (0 until iters).foreach { _ =>
      val cs = centroids // closure capture
      val assigned = vecs.map { case (id, v) =>
        (nearestCentroid(v, cs), v)
      }.toDF("cluster", "v")
      val updated = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      updated.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("dim")) =
          r.getAs[Double]("m")
      }
      centroids = next
    }
    centroids
  }

  private[ops] def nearestCentroid(v: Seq[Float], cs: Array[Array[Double]]): Int = {
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
    val centroids = kMeansCentroids(emb, cells, kmeansIters)
    val cs = centroids
    val assigned = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, v, nearestCentroid(v, cs)) }
      .toDF("vec_id", "embedding", "cell")
    val qRows = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).as[Seq[Float]].collect()
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
    val q = assigned.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    assigned
      .filter(col("cell").isInCollection(probeCells) &&
        col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Approximate top-k: the signature is cut into `bands` bands of
    * `numPlanes/bands` bits; any vector sharing at least one band with the
    * query becomes a candidate and only candidates are scored exactly.
    * More bands => higher recall, more candidates — the recall/cost knob
    * LSH buys at scale. */
  def annTopK(
      emb: DataFrame,
      queryVecId: Long,
      k: Int,
      numPlanes: Int = 16,
      bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val r = numPlanes / bands
    val withBands = emb.select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding"), planes).as("sig"))
      .select(col("vec_id"), col("embedding"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            col("sig").substr(b * lit(r) + lit(1), lit(r)).as("bucket"))))
          .as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val q = withBands.filter(col("vec_id") === queryVecId)
      .select(col("band").as("qband"), col("bucket").as("qbucket"),
        col("embedding").as("qe"))
    withBands.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q),
        col("band") === col("qband") && col("bucket") === col("qbucket"))
      .select(col("vec_id"), col("embedding"), col("qe"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }
}

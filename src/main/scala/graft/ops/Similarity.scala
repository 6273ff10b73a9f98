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

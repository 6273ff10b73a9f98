package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sfDir)
    .select($"vec_id", $"embedding").limit(200).cache()

  test("pqTopK equals a first-principles Scala replay of encode + ADC") {
    val m = 4; val cb = 8
    val codebooks = Pq.trainCodebooks(emb, m, cb, kmeansIters = 2)
    val sub = codebooks.head.head.length
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val q = vecs(0L)
    def d2(a: Array[Double], s: Array[Float], off: Int): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = s(off + i) - a(i); d += x * x; i += 1 }
      d
    }
    val expected = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val approx = (0 until m).map { j =>
        // ties to the lowest code, matching array_position's first-min
        val code = (0 until cb).minBy(c => (d2(codebooks(j)(c), v, j * sub), c))
        d2(codebooks(j)(code), q, j * sub)
      }.sum
      // HALF_UP, matching Spark's round()
      id -> BigDecimal(approx).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val got = Pq.pqTopK(emb, queryVecId = 0L, k = 10, m = m,
        codebookSize = cb, kmeansIters = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("native pqAdcScore kernel is bit-identical to the HOF encode+lookup " +
      "twin on every vector") {
    val m = 4; val cb = 8
    val codebooks = Pq.trainCodebooks(emb, m, cb, kmeansIters = 2)
    val sub = codebooks.head.head.length
    val q = emb.as[(Long, Array[Float])].collect().toMap.apply(0L)
    val adcSeq: Seq[Seq[Double]] = Seq.tabulate(m) { j =>
      Seq.tabulate(cb) { c =>
        var d = 0.0; var i = 0
        while (i < sub) {
          val x = q(j * sub + i) - codebooks(j)(c)(i); d += x * x; i += 1
        }
        d
      }
    }
    val adcArr = Array(adcSeq.map(_.toArray).toArray)
    val diff = emb.select(
        graft.functions.VectorFunctions.pqAdcScore(
          $"embedding", lit(0), codebooks, adcArr).as("native"),
        Pq.adcScoreHof($"embedding", typedLit(adcSeq), codebooks).as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.count() == 0, diff.collect().take(3).mkString("; "))
  }

  test("pqTopK is deterministic across runs") {
    def run() = Pq.pqTopK(emb, queryVecId = 3L, k = 5, m = 8,
      codebookSize = 8, kmeansIters = 2).collect().toSeq.map(_.toSeq)
    assert(run() == run())
  }

  test("ivfPqTopK equals a first-principles replay of cells + residual ADC") {
    val m = 4; val cb = 8; val cells = 4; val nprobe = 2; val iters = 2
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val got = Pq.ivfPqTopK(emb, queryVecId = 0L, k = 10, cells = cells,
        nprobe = nprobe, m = m, codebookSize = cb, kmeansIters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // replay: coarse centroids and residual codebooks from the same
    // deterministic trainers, then pure-Scala assignment + ADC
    val coarse = Similarity.kMeansCentroids(emb, cells, iters)
    val assigned = vecs.map { case (id, v) =>
      val c = Similarity.nearestCentroid(v, coarse)
      val res = Array.tabulate(v.length)(i => (v(i) - coarse(c)(i)).toFloat)
      id -> (c, res)
    }
    // residuals via the same distributed map (k-means partial-merge order
    // is partition-structured, so the training input must share emb's
    // partitioning for the codebooks to be bit-identical)
    val resDf = {
      val cs = coarse
      emb.as[(Long, Array[Float])].map { case (id, v) =>
        val c = Similarity.nearestCentroid(v, cs)
        (id, Array.tabulate(v.length)(i => (v(i) - cs(c)(i)).toFloat))
      }.toDF("vec_id", "embedding")
    }
    val codebooks = Pq.trainCodebooks(resDf, m, cb, iters)
    val sub = codebooks.head.head.length
    val qv = vecs(0L)
    def cd2(c: Int): Double = (0 until qv.length).map { i =>
      val x = qv(i) - coarse(c)(i); x * x }.sum
    val probed = coarse.indices.sortBy(cd2).take(nprobe).toSet
    val expected = assigned.toSeq
      .filter { case (id, (c, _)) => id != 0L && probed.contains(c) }
      .map { case (id, (c, res)) =>
        val approx = (0 until m).map { j =>
          val code = (0 until cb).minBy { k2 =>
            ((0 until sub).map { i =>
              val x = res(j * sub + i).toDouble - codebooks(j)(k2)(i); x * x
            }.sum, k2)
          }
          (0 until sub).map { i =>
            val qr = (qv(j * sub + i) - coarse(c)(j * sub + i)).toFloat
            val x = qr - codebooks(j)(code)(i); x * x
          }.sum
        }.sum
        id -> BigDecimal(approx).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }.sortBy { case (id, d) => (d, id) }.take(10)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("ivfPqTopK is deterministic and releases its training caches") {
    val before = spark.sparkContext.getPersistentRDDs.size
    def run() = Pq.ivfPqTopK(emb, queryVecId = 7L, k = 5, cells = 4,
      nprobe = 2, m = 4, codebookSize = 8, kmeansIters = 2)
      .collect().toSeq.map(_.toSeq)
    assert(run() == run())
    // only the two k-row localCheckpoint results may remain registered
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 2,
      "training caches leaked")
  }

  test("PQ top-50 recovers most of the exact L2 top-10") {
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val q = vecs(0L)
    val exact = vecs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      id -> v.zip(q).map { case (a, b) =>
        (a.toDouble - b) * (a.toDouble - b) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val pq = Pq.pqTopK(emb, queryVecId = 0L, k = 50, m = 8,
        codebookSize = 16, kmeansIters = 3)
      .collect().map(_.getLong(0)).toSet
    val hit = exact.count(pq.contains)
    assert(hit >= 6, s"recall too low: $hit/10 of exact top-10 in PQ top-50")
  }
}

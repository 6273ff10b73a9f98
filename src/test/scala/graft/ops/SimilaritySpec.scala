package graft.ops

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("cosine of a vector with itself is 1") {
    val vs = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (2L, Seq(-1.0f, 0.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val sims = vs.select(
      round(Similarity.cosine($"embedding", $"embedding"), 9).as("c"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(_ == 1.0))
  }

  test("dot/l2Norm match hand-computed values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(3.0f, 0.0f, 4.0f)))
      .toDF("a", "b")
    val r = df.select(
      Similarity.dot($"a", $"b").as("d"),
      Similarity.l2Norm($"a").as("na"),
      Similarity.l2Norm($"b").as("nb")).head()
    assert(r.getDouble(0) == 11.0) // 3 + 0 + 8
    assert(r.getDouble(1) == 3.0)  // sqrt(9)
    assert(r.getDouble(2) == 5.0)  // sqrt(25)
  }

  test("cosineTopK is ordered desc and excludes the query id") {
    val top = Similarity.cosineTopK(emb, 0L, 10).collect()
    assert(top.length == 10)
    assert(!top.map(_.getLong(0)).contains(0L))
    val sims = top.map(_.getAs[Double]("cosine"))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
  }

  test("annTopK returns genuine high-cosine candidates (subset of brute top-50)") {
    val brute50 = Similarity.cosineTopK(emb, 0L, 50)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(emb, 0L, 10).collect()
    assert(ann.nonEmpty, "LSH bucket empty — banding too selective")
    // every ANN result's cosine must equal the brute-force cosine for that
    // id (same scoring), and the best ANN hit should rank in brute top-50
    assert(brute50.contains(ann.head.getLong(0)),
      s"best ANN hit ${ann.head.getLong(0)} not in brute top-50")
  }

  test("ivfTopK: high recall vs brute force with nprobe=cells (exhaustive)") {
    // probing every cell makes IVF exact: must equal brute-force top-10
    val brute = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfAll = Similarity.ivfTopK(emb, 0L, 10, cells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == brute, s"ivf=$ivfAll brute=$brute")
    // partial probing returns a subset of genuine cosines
    val ivf = Similarity.ivfTopK(emb, 0L, 10, cells = 8, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val bruteAll = Similarity.cosineTopK(emb, 0L, 499)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ivf.nonEmpty)
    ivf.foreach { case (id, c) => assert(bruteAll(id) == c) }
  }

  test("kMeans centroids are deterministic and partition the corpus") {
    val c1 = Similarity.kMeansCentroids(emb, 4, iters = 2)
    val c2 = Similarity.kMeansCentroids(emb, 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 4 && c1.forall(_.length == 64))
  }

  test("cosinePairs (primitive-loop kernel) matches expression-tree scoring") {
    val fast = Similarity.cosinePairs(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = emb.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    val slow = a.crossJoin(broadcast(b)).filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b",
        round(Similarity.cosine($"ea", $"eb"), 6).as("cosine"))
      .filter($"cosine" >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == slow,
      s"kernel drift: missing=${slow -- fast} extra=${fast -- slow}")
  }

  test("cosinePairs fails fast above its broadcast bound") {
    val e = intercept[IllegalArgumentException] {
      Similarity.cosinePairs(emb, threshold = 0.4, maxRows = 10L)
    }
    assert(e.getMessage.contains("maxRows"), e.getMessage)
  }

  test("lshNearDupPairs: candidates via equi-join, results subset of exact") {
    val lsh = Similarity.lshNearDupPairs(emb, threshold = 0.4)
    // never cartesian: candidate generation must be an equi-join on the
    // band-bucket key
    val physical = lsh.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    val got = lsh.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.cosinePairs(emb, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty, "LSH found no near-dup pairs at sf spec corpus")
    assert(got.subsetOf(exact),
      s"LSH produced pairs the exact scorer rejects: ${got -- exact}")
  }

  test("multi-probe ANN reaches recall >= 0.9 vs exact top-10") {
    val brute = Similarity.cosineTopK(emb, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val mp = Similarity.annTopK(emb, 0L, 10, multiProbe = true)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(mp).size / 10.0
    assert(recall >= 0.9, s"multi-probe recall $recall; " +
      s"single-probe missed=${brute -- mp}")
    // every returned cosine is still the exact score (subset property)
    val bruteAll = Similarity.cosineTopK(emb, 0L, 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    Similarity.annTopK(emb, 0L, 10, multiProbe = true).collect()
      .foreach(r => assert(bruteAll(r.getLong(0)) == r.getDouble(1)))
  }

  test("native cosine kernel matches the HOF fold bit-for-bit") {
    val a = emb.limit(40).select($"vec_id".as("ida"), $"embedding".as("ea"))
    val b = emb.limit(40).select($"vec_id".as("idb"), $"embedding".as("eb"))
    val drift = a.crossJoin(broadcast(b)).filter($"ida" < $"idb")
      .select(VectorFunctions.cosine($"ea", $"eb").as("fast"),
        Similarity.cosine($"ea", $"eb").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(drift == 0, s"$drift pairs drifted between kernel and HOF cosine")
  }

  test("native lshBandBuckets kernel matches the HOF banding bit-for-bit") {
    val native = Similarity.bandedIds(emb, 16, 4, 64)
      .select($"vec_id", $"band".cast("long").as("band"), $"bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hof = Similarity.bandedSignaturesHof(emb, 16, 4, 64)
      .select($"vec_id", $"band", $"bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(native == hof,
      s"banding drift: missing=${hof -- native} extra=${native -- hof}")
  }

  test("lsh bit signature is deterministic and 0/1 shaped") {
    val planes = Similarity.portablePlanes(16, 64)
    val s1 = emb.limit(5).select(Similarity.lshBits($"embedding", planes).as("s"))
      .as[Seq[Long]].collect()
    val s2 = emb.limit(5).select(Similarity.lshBits($"embedding", planes).as("s"))
      .as[Seq[Long]].collect()
    assert(s1.map(_.toList).sameElements(s2.map(_.toList)))
    assert(s1.forall(s => s.length == 16 && s.forall(b => b == 0L || b == 1L)))
    // plane weights are the portable integer grid, bounded in [-1, 1]
    assert(planes.flatten.forall(w => w >= -1.0 && w <= 1.0))
  }
}

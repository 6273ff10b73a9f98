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

  test("semanticDedup: every vec decided once; drops have a lower-id witness") {
    val decisions = Similarity.semanticDedup(emb, threshold = 0.4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val n = emb.count()
    assert(decisions.size == n, "one decision row per vector")
    val dropped = decisions.collect { case (id, false) => id }.toSet
    // each dropped vec must have a lower-id LSH-bucket-mate above threshold
    val witnesses = Similarity.lshNearDupPairs(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    dropped.foreach { id =>
      assert(witnesses.exists { case (a, b) => b == id && a < id },
        s"dropped vec $id has no lower-id near-dup witness")
    }
    // and no kept vec appears as a vec_b of any witness pair
    witnesses.foreach { case (_, b) => assert(!decisions(b)) }
  }

  test("semanticDedup drops an exact duplicate of an existing vector") {
    val dup = emb.filter($"vec_id" === 0L)
      .select(lit(100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.semanticDedup(emb.unionByName(dup), threshold = 0.9)
      .filter($"vec_id" === 100000L).collect()
    assert(out.length == 1 && !out.head.getBoolean(1),
      "an exact copy (cosine 1.0, identical LSH buckets) must be dropped")
  }

  test("projectedCosineTopK: identical vector scores 1.0 in projected space") {
    val dup = emb.filter($"vec_id" === 0L)
      .select(lit(100000L).as("vec_id"), $"embedding", $"label")
    val top = Similarity.projectedCosineTopK(emb.unionByName(dup), 0L, 1)
      .collect()
    assert(top.head.getLong(0) == 100000L && top.head.getDouble(1) == 1.0,
      s"exact copy must be the projected top-1 at cosine 1.0: ${top.toList}")
  }

  test("projected cosines correlate positively with full-dim cosines (JL)") {
    // The driver corpus is random (near-orthogonal: all query cosines sit
    // in a narrow band), so top-k RANK recall after 64 -> 16 projection is
    // legitimately weak; the property JL actually promises is that inner
    // products are preserved up to distortion. Assert the corpus-wide
    // correlation between full and projected cosine is clearly positive
    // (measured ~0.38 here; real embedding corpora with separated
    // neighborhoods project far better).
    val full = Similarity.cosineTopK(emb, 0L, 1000000)
      .select($"vec_id", $"cosine")
    val proj = Similarity.projectedCosineTopK(emb, 0L, 1000000)
      .select($"vec_id", $"proj_cosine")
    val r = full.join(proj, "vec_id")
      .agg(corr($"cosine", $"proj_cosine")).head().getDouble(0)
    assert(r > 0.2, s"projected/full cosine correlation too weak: $r")
  }

  test("annKnnJoin: per-query results agree with single-query annTopK") {
    val queries = emb.filter($"vec_id".isin(0L, 7L, 42L))
    val joined = Similarity.annKnnJoin(queries, emb, k = 5).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3)).map(r =>
        (r.getLong(1), r.getDouble(2))).toSeq).toMap
    Seq(0L, 7L, 42L).foreach { qid =>
      val single = Similarity.annTopK(emb, qid, 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(qid) == single,
        s"batch kNN for query $qid must equal the single-query path")
    }
  }

  test("annKnnJoin ranks are 1..k dense per query, ordered by cosine") {
    val out = Similarity.annKnnJoin(emb.filter($"vec_id" < 50), emb, k = 3)
      .collect()
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.length).toSeq,
        s"ranks must be dense for query $qid")
      val cosines = byRank.map(_.getDouble(2)).toSeq
      assert(cosines == cosines.sorted.reverse,
        s"rank order must follow cosine desc for query $qid")
      assert(!rows.exists(_.getLong(1) == qid), "self-match excluded")
    }
  }

  test("annKnnJoin corpus bucket cap: generous cap is invisible, tight " +
      "cap keeps the lowest-id bucket-mates") {
    val queries = emb.filter($"vec_id".isin(0L, 7L, 42L))
    val dflt = Similarity.annKnnJoin(queries, emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // a cap above every bucket's occupancy must change nothing
    val wide = Similarity.annKnnJoin(queries, emb, k = 5,
      corpusBucketCap = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(wide == dflt)
    // cap = 1: each bucket contributes only its lowest-id vector, so
    // every returned neighbor must be the min vec_id of one of its
    // buckets — and the output shape stays valid (dense ranks)
    val tight = Similarity.annKnnJoin(queries, emb, k = 5,
      corpusBucketCap = 1).collect()
    val bucketMins = Similarity.bandedIds(emb, 16, 4, 64)
      .groupBy($"band", $"bucket")
      .agg(org.apache.spark.sql.functions.min($"vec_id").as("m"))
      .collect().map(_.getAs[Long]("m")).toSet
    tight.foreach(r => assert(bucketMins.contains(r.getLong(1)),
      s"neighbor ${r.getLong(1)} survived a cap-1 bucket without being " +
        "its minimum"))
    tight.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
  }

  test("annRecallAtK: hit counts equal an independent intersection of " +
      "the two rankings") {
    val queries = emb.filter($"vec_id".isin(0L, 7L, 42L))
    val out = Similarity.annRecallAtK(queries, emb, k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(0L, 7L, 42L))
    out.values.foreach { case (nAnn, nHits) =>
      assert(nHits <= nAnn && nAnn <= 5)
    }
    // independent check per query: ANN ids from annKnnJoin, exact ids
    // from cosineTopK (both already spec-pinned), intersected by hand
    Seq(0L, 7L, 42L).foreach { qid =>
      val annIds = Similarity.annKnnJoin(emb.filter($"vec_id" === qid),
        emb, k = 5).collect().map(_.getLong(1)).toSet
      val exactIds = Similarity.cosineTopK(emb, qid, 5)
        .collect().map(_.getLong(0)).toSet
      assert(out(qid) == ((annIds.size.toLong,
        annIds.intersect(exactIds).size.toLong)))
    }
  }

  test("filteredCosineTopK equals a hand-built filtered brute force") {
    val filtered = Similarity.filteredCosineTopK(emb, $"label" === 1, 0L, 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("cosine")))
    // independent formulation: the query vector comes from the FULL
    // relation (its own label is irrelevant); only candidates filter
    val q = emb.filter($"vec_id" === 0L).select($"embedding".as("qe"))
    val brute = emb.filter($"label" === 1 && $"vec_id" =!= 0L).crossJoin(q)
      .select($"vec_id",
        round(Similarity.cosine($"embedding", $"qe"), 6).as("cosine"))
      .orderBy($"cosine".desc, $"vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(filtered.toSeq == brute.toSeq)
  }

  test("filteredCosineTopK returns only rows satisfying the predicate") {
    val labels = Similarity.filteredCosineTopK(emb, $"label" === 2, 0L, 10)
      .select($"label").as[Int].collect()
    assert(labels.nonEmpty && labels.forall(_ == 2))
  }

  test("randomProject output is outDim doubles and deterministic") {
    val p1 = Similarity.randomProject(emb).orderBy($"vec_id").limit(3)
      .select($"pv").as[Seq[Double]].collect()
    val p2 = Similarity.randomProject(emb).orderBy($"vec_id").limit(3)
      .select($"pv").as[Seq[Double]].collect()
    assert(p1.map(_.toList).sameElements(p2.map(_.toList)))
    assert(p1.forall(_.length == 16))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  test("ngramCosinePairs computes exact cosine on a hand-checked pair") {
    // with n=1 the vectors are plain token counts:
    // d1 = {a:2, b:1}, d2 = {a:1, b:1}  ->  dot=3, |d1|^2=5, |d2|^2=2
    val docs = Seq((1L, "a a b"), (2L, "a b")).toDF("doc_id", "text")
    val r = SparseSim.ngramCosinePairs(docs, n = 1, threshold = 0.1,
      maxDf = 10).head()
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("dot") == 3L)
    assert(r.getAs[Double]("cosine") == 3.0 / (math.sqrt(5.0) * math.sqrt(2.0)))
  }

  test("df cap removes stop-grams from the vector space") {
    // 'x y z' in every doc is a stop trigram under maxDf=2; without it
    // docs 1 and 2 share nothing
    val docs = Seq(
      (1L, "a b c x y z"), (2L, "d e f x y z"), (3L, "a b c x y z")
    ).toDF("doc_id", "text")
    val pairs = SparseSim.ngramCosinePairs(docs, n = 3, threshold = 0.1,
        maxDf = 2)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got $pairs")
  }

  test("posting-list join matches brute-force cosine over all pairs") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(120)
    val got = SparseSim.ngramCosinePairs(docs, n = 3, threshold = 0.4,
        maxDf = 1000)
      .select($"doc_a", $"doc_b", $"cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force from first principles over exploded grams
    val tf = docs.select($"doc_id", explode(filter(
        TextAnalysis.positionalHashedNgrams($"text", 3), g => g.isNotNull))
        .as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("tf"))
    val rows = tf.collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    val ids = rows.keys.toSeq.sorted
    val naive = (for {
      i <- ids; j <- ids if i < j
      va = rows(i); vb = rows(j)
      dot = va.keySet.intersect(vb.keySet).toSeq
        .map(g => va(g) * vb(g)).sum
      if dot > 0
      cos = dot.toDouble / (math.sqrt(va.values.map(v => v * v).sum.toDouble) *
        math.sqrt(vb.values.map(v => v * v).sum.toDouble))
      if cos >= 0.4
    } yield (i, j) -> cos).toMap
    assert(got.keySet == naive.keySet,
      s"missing=${(naive.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- naive.keySet).take(3)}")
    naive.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"$k: ${got(k)} vs $v") }
  }

  test("pair generation is an equi-join on the gram, never all-pairs") {
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val p = SparseSim.ngramCosinePairs(docs, n = 2, threshold = 0.1,
        maxDf = 10, eager = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("eager run releases the tf cache and returns checkpoint-backed rows") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparseSim.ngramCosinePairs(docs, n = 2, threshold = 0.3,
      maxDf = 10)
    assert(out.count() >= 1)
    val fresh = spark.sparkContext.getPersistentRDDs -- pre
    assert(fresh.values.forall(
      org.apache.spark.rdd.GraftRddTestBridge.isLocallyCheckpointed),
      "tf persist escaped the call")
  }

  test("window-computed df keeps exactly the postings a brute-force df " +
      "count keeps") {
    // the round-15 rewrite computes the df cap as count(*) over
    // (partition by gram) instead of groupBy + semi-join; survivors
    // must be the identical (doc, gram, tf) set for any corpus — df is
    // row-count-per-gram either way because tf has ONE row per
    // (doc, gram). Pin it against an independent df computed by hand.
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(80)
    val maxDf = 5L
    val pairs = SparseSim.ngramCosinePairs(docs, n = 2, threshold = 0.05,
      maxDf = maxDf)
    // brute force: per-pair cosine over hand-capped postings
    val tf = docs
      .select($"doc_id", explode(filter(
        TextAnalysis.positionalHashedNgrams($"text", 2),
        g => g.isNotNull)).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"gram").agg(count(lit(1)).as("df"))
    val kept = tf.join(df.filter($"df" <= maxDf).select($"gram"),
      Seq("gram"), "left_semi")
    val norms = kept.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("ss"))
    val brute = kept.as("a").join(kept.as("b"),
        col("a.gram") === col("b.gram") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
      .join(norms.select($"doc_id".as("doc_a"), $"ss".as("ssa")), "doc_a")
      .join(norms.select($"doc_id".as("doc_b"), $"ss".as("ssb")), "doc_b")
      .withColumn("cosine", $"dot".cast("double") /
        (sqrt($"ssa".cast("double")) * sqrt($"ssb".cast("double"))))
      .filter($"cosine" >= 0.05)
      .select($"doc_a", $"doc_b", $"dot", $"cosine")
    assert(pairs.collect().toSet == brute.collect().toSet)
  }
}

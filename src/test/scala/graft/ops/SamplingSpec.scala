package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1 to 60).map { i =>
    val lang = if (i <= 40) "en" else if (i <= 55) "de" else "xx"
    (i.toLong, s"doc number $i with some text body", lang)
  }.toDF("doc_id", "text", "lang")

  test("mixtureResample keeps under-represented keys whole, drops unlisted") {
    val out = Sampling.mixtureResample(corpus, "lang",
        Seq("en" -> 30, "de" -> 30))
      .collect().map(r => r.getString(0) -> r).toMap
    // n_total=60: desired en = 18 < 40 -> downsampled below bucket size;
    // desired de = 18 >= 15 -> rate capped at 1, every doc kept
    assert(out.keySet == Set("en", "de"), "unlisted key must be dropped")
    assert(out("de").getAs[Long]("desired_n") == 18L)
    assert(out("de").getAs[Long]("n_sampled") == 15L)
    assert(out("en").getAs[Long]("desired_n") == 18L)
    assert(out("en").getAs[Long]("n_sampled") <= 40L)
  }

  test("mixtureResample is deterministic and stable under re-sharding") {
    val a = Sampling.mixtureResample(corpus, "lang", Seq("en" -> 25))
      .collect().toSeq
    val b = Sampling.mixtureResample(corpus.repartition(7), "lang",
        Seq("en" -> 25)).collect().toSeq
    assert(a.map(_.toSeq).sortBy(_.toString) == b.map(_.toSeq).sortBy(_.toString))
  }

  test("mixtureResample rejects targets summing past 100 or out of range") {
    intercept[IllegalArgumentException] {
      Sampling.mixtureResample(corpus, "lang", Seq("en" -> 60, "de" -> 50))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureResample(corpus, "lang", Seq("en" -> -1))
    }
  }

  test("perKeyCap keeps the lowest ids per key, at most cap each") {
    import spark.implicits._
    val docs = Seq(
      (5L, "a"), (1L, "a"), (3L, "a"), (2L, "b"), (9L, "b"), (7L, "c"))
      .toDF("doc_id", "key")
    val out = Sampling.perKeyCap(docs, "key", cap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (3L, "a"), (2L, "b"), (9L, "b"), (7L, "c")),
      s"lowest doc_ids win deterministically: $out")
  }

  test("tokenBudgetSelect equals the naive per-key window formulation") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
    val budget = 3000L
    val got = Sampling.tokenBudgetSelect(docs, "source", "n_chars", "tok",
        budget)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("priority"), r.getAs[Long]("tok"),
        r.getAs[Long]("cum_tok"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = docs
      .withColumn("cum_tok", sum(col("tok")).over(w))
      .filter(col("cum_tok") <= budget)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Any]("n_chars").toString.toLong, r.getAs[Long]("tok"),
        r.getAs[Long]("cum_tok"))).toSet
    assert(got == naive, "histogram decomposition must be row-for-row exact")
    assert(got.nonEmpty)
  }

  test("tokenBudgetSelect handles priority ties across the budget boundary") {
    import spark.implicits._
    // one key, all same priority: order within the bin is id asc, and the
    // budget (7) cuts mid-bin after ids 1 (3 tok) and 2 (3 tok)
    val docs = Seq((1L, "k", 10, 3L), (2L, "k", 10, 3L), (3L, "k", 10, 3L),
        (4L, "k", 10, 3L))
      .toDF("doc_id", "key", "pri", "tok")
    val kept = Sampling.tokenBudgetSelect(docs, "key", "pri", "tok", 7L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tok"))
      .toMap
    assert(kept == Map(1L -> 3L, 2L -> 6L))
  }

  test("perKeyCap passes under-cap keys through untouched") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, "only")).toDF("doc_id", "key")
    assert(Sampling.perKeyCap(docs, "key", cap = 10).count() == 5)
    intercept[IllegalArgumentException] {
      Sampling.perKeyCap(docs, "key", cap = 0)
    }
  }
}

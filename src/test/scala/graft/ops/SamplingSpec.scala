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

  test("ppsSample equals the naive single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1 to 97).map(i => (i.toLong, s"k${i % 3}", 10L + i * 7 % 50))
      .toDF("doc_id", "key", "w")
    val k = 5
    val wCum = Window.partitionBy($"key").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy($"key")
    val naive = docs
      .withColumn("cum", sum($"w").over(wCum))
      .withColumn("tot", sum($"w").over(wAll))
      .withColumn("n_picks",
        expr(s"(cum * $k) div tot - ((cum - w) * $k) div tot"))
      .filter($"n_picks" > 0)
      .select($"key", $"doc_id", $"w", $"cum", $"n_picks")
      .collect().map(_.toSeq).sortBy(_.toString)
    // binSize=4 forces many bins per key, so the offset+intra path is hit
    val out = Sampling.ppsSample(docs, "key", "w", k, binSize = 4L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(out.toSeq == naive.toSeq)
  }

  test("ppsSample picks sum to exactly k per key; heavy rows multi-count") {
    val docs = Seq(
      (1L, "a", 1L), (2L, "a", 1L), (3L, "a", 96L), (4L, "a", 1L),
      (5L, "b", 5L), (6L, "b", 5L)).toDF("doc_id", "key", "w")
    val out = Sampling.ppsSample(docs, "key", "w", k = 4)
    val perKey = out.groupBy($"key").agg(sum($"n_picks").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey == Map("a" -> 4L, "b" -> 4L),
      s"picks must telescope to k per key: $perKey")
    // doc 3 holds 96/99 of key a's mass: it must absorb several strides
    val heavy = out.filter($"doc_id" === 3L).head.getAs[Long]("n_picks")
    assert(heavy >= 3L, s"heavy row under-counted: $heavy")
  }

  test("ppsSample is deterministic and stable under re-sharding") {
    val docs = (1 to 60).map(i => (i.toLong, s"s${i % 2}", (i % 9) + 1L))
      .toDF("doc_id", "key", "w")
    val a = Sampling.ppsSample(docs, "key", "w", 7)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = Sampling.ppsSample(docs.repartition(13), "key", "w", 7)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
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

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: String*) =
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("sketched path equals the exact full-shuffle twin") {
    // 40 distinct fillers + 3 genuinely frequent tokens, spread over rows
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = docs(
      ("hot " * 30).trim,
      ("warm " * 20).trim + " " + filler,
      ("hot warm tepid " * 10).trim,
      filler)
    val sketched = HeavyHitters.heavyHitterTokens(df, minFreq = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = HeavyHitters.heavyHitterTokensExact(df, minFreq = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketched == exact)
    assert(sketched.map(_._1).contains("hot"))
    // counts are exact, not sketch estimates
    assert(sketched.toMap.apply("hot") == 40L)
  }

  test("eviction path: capacity below vocabulary still finds all true HHs") {
    // force tiny capacity (minFreq 0.45 -> capacity 3) with 6 distinct
    // tokens in ONE partition so decrement-all eviction must run
    val df = docs((("a " * 55) + "b c d e f").trim).repartition(1)
    val out = HeavyHitters.heavyHitterTokens(df, minFreq = 0.45)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 55L))) // 55/60 > 0.45; others 1/60 each
  }

  test("no token above threshold yields empty result, not an error") {
    val df = docs("a b c d", "e f g h")
    assert(HeavyHitters.heavyHitterTokens(df, minFreq = 0.5).count() == 0L)
  }

  test("candidate generation never loses a true heavy hitter across partitions") {
    // skewed placement: 'k' is heavy only globally (spread thin over
    // partitions among heavy local noise) — the pigeonhole bound still
    // guarantees k survives in the partition where its share is highest
    val rows = (1 to 8).map { p => (p.toLong, ("k " * 12 + s"p$p " * 10).trim) }
    val df = rows.toDF("doc_id", "text").repartition(8, $"doc_id")
    val out = HeavyHitters.heavyHitterTokens(df, minFreq = 0.3)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("k")) // k: 96/176 = 0.545; each p_i: 80/176 total? no — 10/176
  }
}

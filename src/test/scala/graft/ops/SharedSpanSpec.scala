package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SharedSpanSpec extends SparkSpec {
  import spark.implicits._

  test("sharedSpanPairs finds a planted verbatim paragraph") {
    val para = "alpha beta gamma delta epsilon zeta eta theta"  // 8 tokens
    val docs = Seq(
      (1L, s"intro one two $para closing words here"),
      (2L, s"different opening stanza $para and another tail"),
      (3L, "no overlap with anything else at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(docs, minSpanTokens = 5, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 8L)),
      s"exactly the planted 8-token span must surface: $out")
  }

  test("repeated n-grams inside a doc do not misalign span positions") {
    // 'dup dup dup' repeats the same gram — the distinct-shingle kernel
    // would renumber positions here and shorten the detected run
    val shared = "one two three four five six seven dup dup dup dup tail"
    val docs = Seq(
      (1L, s"$shared ending alpha"),
      (2L, s"prefix words $shared")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(docs, minSpanTokens = 5, dfCap = 10)
      .head
    // the shared run is the full 12-token block
    assert(out.getLong(2) == 12L, s"span must survive repeats: $out")
  }

  test("df-capped grams cannot create pairs on their own") {
    // the same 5-token sentence in 12 docs: every gram has df=12 > cap
    val docs = (1L to 12L)
      .map(i => (i, "common shared sentence appears everywhere verbatim"))
      .toDF("doc_id", "text")
    val out = Dedup.sharedSpanPairs(docs, minSpanTokens = 5, dfCap = 10)
    assert(out.count() == 0, "stop-gram guard must suppress corpus-wide spam")
  }

  test("hashedNgramOccurrences: positions align, distinct set matches kernel") {
    val df = Seq("a b a b a b").toDF("text")
    val occ = df.select(TextAnalysis.hashedNgramOccurrences($"text", 3).as("g"))
      .head.getSeq[Any](0)
    assert(occ.length == 6 && occ.takeRight(2).forall(_ == null),
      s"len tokens entries, trailing n-1 null: $occ")
    val longs = occ.dropRight(2).map(_.asInstanceOf[Long])
    assert(longs(0) == longs(2) && longs(1) == longs(3) && longs(0) != longs(1),
      "alternating grams must alternate hashes")
    val distinct = df.select(TextAnalysis.hashedNgrams($"text", 3))
      .head.getSeq[Long](0)
    assert(longs.distinct.sorted == distinct.sorted,
      "occurrence fold and distinct kernel agree on the shingle set")
  }
}

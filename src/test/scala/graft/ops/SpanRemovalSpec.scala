package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (String, Int)] =
    Dedup.removeRepeatedSpans(rows.toDF("doc_id", "text"), spanTokens = 4,
        minDocs = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap

  private val span = "s1 s2 s3 s4" // one 4-token repeated block

  test("the first occurrence in (doc_id, pos) order survives; every " +
      "other occurrence is cut") {
    val out = run(
      0L -> s"a b $span c",
      1L -> s"x $span y z",
      2L -> "p q r s t u v w")
    assert(out(0L) == (s"a b $span c", 0), "keeper doc was rewritten")
    assert(out(1L) == ("x y z", 4), s"got ${out(1L)}")
    assert(out(2L)._2 == 0, "untouched doc lost tokens")
  }

  test("intra-document repetition alone does not trigger removal") {
    val out = run(
      0L -> s"$span m $span", // repeats only inside doc 0
      1L -> "totally different words here")
    assert(out(0L)._2 == 0 && out(1L)._2 == 0)
  }

  test("once corpus-repeated, extra copies inside the keeper's own " +
      "document are cut too") {
    val out = run(
      0L -> s"$span m $span", // first copy keeps, second copy cuts
      1L -> s"q $span r")
    assert(out(0L) == (s"$span m", 4), s"got ${out(0L)}")
    assert(out(1L) == ("q r", 4), s"got ${out(1L)}")
  }

  test("three-way repeats keep exactly one copy corpus-wide") {
    val out = run(
      3L -> s"$span tail3",
      1L -> s"$span tail1",
      2L -> s"$span tail2")
    // keeper is the smallest doc_id, not input order
    assert(out(1L) == (s"$span tail1", 0))
    assert(out(2L) == ("tail2", 4) && out(3L) == ("tail3", 4))
  }

  test("overlapping repeated windows cut their union of covered tokens") {
    // docs share a 6-token block -> three repeated 4-windows in doc 1,
    // overlapping; removal must cut the union (all 6 tokens), not 12
    val block = "b1 b2 b3 b4 b5 b6"
    val out = run(
      0L -> s"$block end0",
      1L -> s"start1 $block")
    assert(out(0L)._2 == 0)
    assert(out(1L) == ("start1", 6), s"got ${out(1L)}")
  }

  test("a fully-covered document rewrites to the empty string") {
    val out = run(0L -> span, 1L -> span)
    assert(out(0L) == (span, 0))
    assert(out(1L) == ("", 4), s"got ${out(1L)}")
  }

  test("every input doc comes back exactly once") {
    val docs = (0L until 20L).map(i => (i, s"unique$i words$i here$i now$i"))
    val out = run(docs: _*)
    assert(out.keySet == (0L until 20L).toSet)
    assert(out.values.forall(_._2 == 0))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over the lazy dog again and again " * 3
  private val junk = "!!! ??? 123 456 789 000 --- +++ === ~~~"

  test("curate: dedup runs before the quota so copies never spend budget") {
    // 4 distinct good docs in one source + 3 exact copies of the first;
    // cap = 4: with dedup-first all 4 distinct docs survive
    val docs = (1L to 4L).map(i => (i, s"$good tail$i", "s1")) ++
      Seq((5L, s"$good tail1", "s1"), (6L, s"$good tail1", "s1"),
        (7L, s"$good tail1", "s1"))
    val out = Pipeline.curate(docs.toDF("doc_id", "text", "source"),
        minTokens = 10, minAlpha = 0.5, perSourceCap = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L, 4L),
      s"duplicates must collapse to the keeper before the cap: $out")
  }

  test("curate: quality gate filters short and non-alphabetic docs") {
    val docs = Seq(
      (1L, good, "s"), (2L, "too short", "s"), (3L, junk + " " + junk, "s"))
      .toDF("doc_id", "text", "source")
    val out = Pipeline.curate(docs, minTokens = 10, minAlpha = 0.5,
      perSourceCap = 10).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), s"gate must drop 2 (short) and 3 (symbols): $out")
  }

  test("curate: per-source cap keeps the lowest surviving ids") {
    val docs = (1L to 6L).map(i => (i, s"$good v$i", if (i <= 4) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val out = Pipeline.curate(docs, minTokens = 10, minAlpha = 0.5,
        perSourceCap = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "a"), (5L, "b"), (6L, "b")), s"$out")
  }

  test("hllDistinctByKey matches the ungrouped sketch per group") {
    val df = (1L to 3000L).map(k => (k, if (k % 3 == 0) "x" else "y"))
      .toDF("k", "g")
    val grouped = Sketches.hllDistinctByKey(df, "k", "g").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq("x", "y").foreach { g =>
      val single = Sketches.hllDistinct(df.filter($"g" === g), "k")
        .head.getDouble(0)
      assert(grouped(g) == single,
        s"group $g sketch must equal the filtered ungrouped sketch")
    }
  }
}

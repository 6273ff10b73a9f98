package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "spark"), (2L, "sprak"), (3L, "sparkle"), (4L, "")
  ).toDF("lid", "ls")
  private def right = Seq(
    (10L, "spark"),  // equal to 1; substitution-2 of 2
    (11L, "spar"),   // deletion of 1
    (12L, "sparks"), // insertion of 1
    (13L, "stark"),  // substitution of 1
    (14L, "shark"),  // substitution of 1
    (15L, "a")       // insertion of 4 (empty string)
  ).toDF("rid", "rs")

  test("editDistance1Join equals brute-force levenshtein <= 1") {
    val got = Fuzzy.editDistance1Join(left, "lid", "ls", right, "rid", "rs")
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, s"pair duplicated: ${got.toSeq}")
    val naive = left.crossJoin(right)
      .filter(levenshtein($"ls", $"rs") <= 1)
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == naive, s"got=${got.toSet} naive=$naive")
    // the shapes the neighborhood must cover: equal, deletion, insertion,
    // substitution, and the empty-string edge
    assert(Set((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (4L, 15L))
      .subsetOf(got.toSet))
    // distance-2 shapes that share a variant must be verified away
    assert(!got.toSet.contains((2L, 13L)), "sprak-stark is distance 2")
  }

  test("deletion neighborhood has the string plus one hash per deletion") {
    val n = Seq("abc").toDF("s")
      .select(size(Fuzzy.deletionNeighborhoodHashes($"s"))).head().getInt(0)
    assert(n == 4) // abc, bc, ac, ab
    // repeated characters collapse: aa -> {aa, a}
    val dup = Seq("aa").toDF("s")
      .select(size(Fuzzy.deletionNeighborhoodHashes($"s"))).head().getInt(0)
    assert(dup == 2)
  }

  test("kernel neighborhood matches the HOF shape's size, and code-point " +
      "deletions keep astral-plane pairs joinable") {
    // same count as the expression formulation (values differ by design:
    // the kernel's rolling poly replaces xxhash64 — only equality matters)
    val sized = Seq("spark", "aa", "", "sparkle").toDF("s")
      .select(size(Fuzzy.deletionNeighborhoodHashes($"s")).as("k"),
        size(Fuzzy.deletionNeighborhoodHashesHof($"s")).as("h"))
      .collect()
    sized.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // a surrogate-pair (astral) code point must delete WHOLE: "a𝕏b" and
    // "ab" are levenshtein distance 1 (code points), so they must share
    // a neighborhood member
    val l = Seq((1L, "a𝕏b")).toDF("lid", "ls")
    val r = Seq((2L, "ab")).toDF("rid", "rs")
    val got = Fuzzy.editDistance1Join(l, "lid", "ls", r, "rid", "rs")
      .select($"lid", $"rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)), got.toSeq.toString)
  }

  test("a repeated id never multiplies output pairs") {
    // ids are documented unique per side; an accidental duplicate (same
    // id carried twice with its string, the realistic violation) must
    // not fan out the join-back into duplicated (lid, rid) pairs
    val dupLeft = left.union(left.filter($"lid" === 1L))
    val got = Fuzzy.editDistance1Join(dupLeft, "lid", "ls", right, "rid", "rs")
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length,
      s"duplicate id multiplied pairs: ${got.toSeq}")
    val clean = Fuzzy.editDistance1Join(left, "lid", "ls", right, "rid", "rs")
      .select($"lid", $"rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == clean)
  }

  test("candidates come from an equi-join, never a cross join") {
    val p = Fuzzy.editDistance1Join(left, "lid", "ls", right, "rid", "rs")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}

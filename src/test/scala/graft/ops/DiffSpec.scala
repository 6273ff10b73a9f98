package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
    .toDF("doc_id", "text")
  private val newSnap = Seq(
    (1L, "alpha"),           // unchanged
    (2L, "beta edited"),     // changed
    // 3 removed
    (4L, "delta"),           // unchanged
    (9L, "epsilon"))         // added
    .toDF("doc_id", "text")

  test("snapshotDiff classifies the four statuses from fingerprints") {
    val got = Diff.snapshotDiff(oldSnap, newSnap, "doc_id",
        TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 9L -> "added"))
  }

  test("snapshotDiffCounts aggregates per status") {
    val got = Diff.snapshotDiffCounts(oldSnap, newSnap, "doc_id",
        TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L,
      "added" -> 1L))
  }

  test("identical snapshots diff to all-unchanged") {
    val got = Diff.snapshotDiffCounts(oldSnap, oldSnap, "doc_id",
        TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 4L))
  }
}

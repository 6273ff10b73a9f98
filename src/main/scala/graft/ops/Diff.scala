package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the validation step of an incremental corpus update:
  * classify every key of the new snapshot against the old one as
  * added / removed / changed / unchanged, from content fingerprints
  * rather than full-row comparison. The incremental sibling of
  * [[Checksum.tableChecksum]] (which answers "are they identical";
  * this answers "what changed").
  *
  * Scale shape: each side reduces to (key, fingerprint) — 16-byte rows —
  * before the single full-outer equi-join on the key; document payloads
  * never ride the shuffle (the ids-only discipline of the LSH joins).
  * Fingerprints are the engine-portable rolling hash, so the same diff
  * replays on any engine. Reference analog: the resume/anti-join
  * discipline of /root/reference scripts/01b_make_cog_all.R:84-89
  * (what-is-already-done as a set difference), generalized to
  * content-change detection.
  */
object Diff {

  /** Per-key status rows: (key, status). `rowFingerprint` is an
    * unresolved column expression evaluated against BOTH snapshots
    * (e.g. `TextAnalysis.fingerprint(col("text"))`). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      rowFingerprint: Column): DataFrame = {
    val o = oldDf.select(col(keyCol).as("key"), rowFingerprint.as("__ho"))
    val n = newDf.select(col(keyCol).as("key"), rowFingerprint.as("__hn"))
    o.join(n, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Aggregated diff summary: one row per status with its key count. */
  def snapshotDiffCounts(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      rowFingerprint: Column): DataFrame =
    snapshotDiff(oldDf, newDf, keyCol, rowFingerprint)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}

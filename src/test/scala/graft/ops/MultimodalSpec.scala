package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("withBlob produces binary payload + modality metadata") {
    val b = Multimodal.withBlob(docs)
    assert(b.schema("payload").dataType.typeName == "binary")
    val mods = b.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("extractFeatures: n_bytes matches text length, checksum deterministic") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withBlob(docs))
    val joined = feats.toDF().join(docs, "doc_id")
      .select(col("n_bytes"), length(col("text")).cast("long").as("tl"),
        col("checksum"))
    assert(joined.filter(col("n_bytes") =!= col("tl")).count() == 0)
    // run twice -> identical checksums (stub decoder is deterministic)
    val c1 = feats.toDF().select("doc_id", "checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c2 = Multimodal.extractFeatures(spark,
        Multimodal.withBlob(docs.repartition(3)))
      .toDF().select("doc_id", "checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == c2) // partitioning must not change per-row results
  }

  test("frame sampling yields bounded evenly-spaced windows per video") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.withBlob(docs.limit(30)), n = 4).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.length <= 4)
      assert(fs.map(_.frame_idx).sorted.sameElements(fs.indices))
      assert(fs.forall(f => f.frame.nonEmpty && f.frame.length <= 16))
    }
    // only video modality sampled (doc_id % 3 == 2)
    assert(byDoc.keySet.forall(_ % 3 == 2))
  }

  test("resize stub produces fixed-width strided output") {
    val in = Array.tabulate(16)(_.toFloat)
    val out = Multimodal.resizeStub(in, 4)
    assert(out.toSeq == Seq(0f, 4f, 8f, 12f))
  }

  test("feature vector has the requested fixed width") {
    val f = Multimodal.extractFeatures(spark,
      Multimodal.withBlob(docs.limit(5)), dim = 8).collect()
    assert(f.forall(_.feature.length == 8))
  }
}

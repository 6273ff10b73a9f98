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

  test("feature vector has the requested fixed width") {
    val f = Multimodal.extractFeatures(spark,
      Multimodal.withBlob(docs.limit(5)), dim = 8).collect()
    assert(f.forall(_.feature.length == 8))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and decode/feature-extraction
  * runs per-partition on executors.
  *
  * The decode step itself is STUBBED (no codec libraries in this
  * environment): `fakeDecodeFeatures` derives a deterministic feature
  * vector from the bytes. Everything around it — schema, binary column
  * handling, partition-parallel batch execution via mapPartitions, typed
  * encoders — is real and is exactly the structure a JNI/FFmpeg-backed
  * decoder would drop into.
  */
object Multimodal {

  /** A blob row as it would arrive from `binaryFile` or a media table. */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features: one row per media asset. */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      n_bytes: Long,
      // STUB: stands in for decoded width/height/duration/etc.
      checksum: Long,
      feature: Array[Float])

  /** Attach a binary payload column to a text table (simulates media blobs
    * with deterministic bytes so tests are hermetic). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("modality"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder: a real implementation would hand `payload` to an image
    * or audio codec here. The Spark-side contract (executed per partition,
    * byte-array in, fixed-width float feature out) is the real thing. */
  private[ops] def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 1125899906842597L // deterministic FNV-ish fold
    var i = 0
    while (i < payload.length) {
      acc = acc * 31 + (payload(i) & 0xff); i += 1
      out(i % dim) += ((acc >>> 16) & 0xffff) / 65536.0f
    }
    out
  }

  /** STUB resize: a real decoder would rescale decoded image planes; the
    * stand-in downsamples the feature vector by striding — the Spark-side
    * contract (fixed-width in, fixed-width out, per-row) is the real
    * shape. */
  private[ops] def resizeStub(feature: Array[Float], outDim: Int): Array[Float] = {
    val out = new Array[Float](outDim)
    var i = 0
    while (i < outDim) {
      out(i) = feature((i.toLong * feature.length / outDim).toInt); i += 1
    }
    out
  }

  /** STUB frame sampling: slices `n` evenly-spaced fixed-size windows out
    * of the payload, standing in for video frame extraction. Returns
    * fewer windows when the payload is short. */
  private[ops] def frameSampleStub(payload: Array[Byte], n: Int,
      frameBytes: Int = 16): Seq[Array[Byte]] = {
    if (payload.isEmpty) Seq.empty
    else (0 until n).flatMap { i =>
      val start = (i.toLong * payload.length / n).toInt
      if (start < payload.length)
        Some(payload.slice(start, math.min(start + frameBytes, payload.length)))
      else None
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame-sampling operator over the media table (video modality only);
    * one output row per sampled frame. */
  def sampleFrames(spark: SparkSession, blobs: DataFrame, n: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    blobs.filter(col("modality") === "video")
      .select(col("doc_id"), col("modality"), col("payload")).as[MediaRow]
      .flatMap { r =>
        frameSampleStub(r.payload, n).zipWithIndex.map { case (f, i) =>
          FrameRow(r.doc_id, i, f)
        }
      }
  }

  /** Partition-parallel feature extraction: the batch shape a
    * mapInPandas/Arrow UDF would use, expressed as a typed mapPartitions
    * (one decoder init per partition, streaming over rows). */
  def extractFeatures(spark: SparkSession, blobs: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("modality"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder/codec initialization would happen here
        rows.map { r =>
          var crc = 7L
          r.payload.foreach(b => crc = (crc * 31 + (b & 0xff)) % 1000000007L)
          MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, crc,
            fakeDecodeFeatures(r.payload, dim))
        }
      }
  }
}

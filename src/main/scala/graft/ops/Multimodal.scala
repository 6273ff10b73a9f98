package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata, and decode/feature-extraction
  * runs per-partition on executors.
  *
  * Image decode is REAL: `decodeImage` runs `javax.imageio` (PNG/BMP/…)
  * per row on the executors, and image features derive from decoded
  * pixels. Audio/video decode remains STUBBED (no codec libraries in this
  * environment): `fakeDecodeFeatures` derives a deterministic feature
  * vector from the bytes. Everything around both — schema, binary column
  * handling, partition-parallel batch execution via mapPartitions, typed
  * encoders — is the structure a JNI/FFmpeg-backed decoder drops into.
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
    * (one decoder init per partition, streaming over rows). Image rows
    * whose payload is a decodable image get REAL pixel-derived features
    * (`javax.imageio` decode + per-stripe luminance); anything else falls
    * back to the deterministic byte-fold stub. */
  def extractFeatures(spark: SparkSession, blobs: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("modality"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder/codec initialization would happen here
        rows.map { r =>
          var crc = 7L
          r.payload.foreach(b => crc = (crc * 31 + (b & 0xff)) % 1000000007L)
          val feature =
            if (r.modality == "image")
              decodeImage(r.payload).map(imageStripeFeatures(_, dim))
                .getOrElse(fakeDecodeFeatures(r.payload, dim))
            else fakeDecodeFeatures(r.payload, dim)
          MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, crc,
            feature)
        }
      }
  }

  // ---- real image decode (javax.imageio) ----------------------------------

  /** REAL decode: any ImageIO-supported container (PNG, BMP, GIF, JPEG).
    * Undecodable bytes yield None — error-as-data, never a task failure. */
  private[ops] def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case _: Exception => None }

  /** Mean luminance per vertical stripe of a decoded image — a fixed-width
    * feature vector derived from actual pixels. */
  private[ops] def imageStripeFeatures(img: BufferedImage, dim: Int): Array[Float] = {
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        val s = (x.toLong * dim / img.getWidth).toInt
        sums(s) += lum; counts(s) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat)
  }

  /** Deterministic synthetic PNG fixture: pixel (x, y) of document d has
    * channels r = (7d+13x+31y) mod 256, g = (11d+17x+5y) mod 256,
    * b = (3d+23x+29y) mod 256 — pure integer functions of the data, and
    * PNG is lossless, so decoded pixel statistics are replayable by the
    * DuckDB oracle without any image library (q69). */
  def syntheticImageBytes(docId: Long, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7 * docId + 13 * x + 31 * y) % 256).toInt
        val g = ((11 * docId + 17 * x + 5 * y) % 256).toInt
        val b = ((3 * docId + 23 * x + 29 * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  case class ImageStats(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Image-decode statistics over the image-modality slice of a document
    * table: each executor task GENERATES the synthetic PNG fixture for its
    * rows, runs the real `javax.imageio` decode, and folds exact integer
    * channel sums over the decoded pixels. The means are exact rationals
    * (integer sums / pixel count), so they compare bit-for-bit with the
    * oracle's analytic replay of the generator pattern. */
  def imageDecodeStats(spark: SparkSession, docs: DataFrame,
      w: Int = 16, h: Int = 16): Dataset[ImageStats] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val img = decodeImage(syntheticImageBytes(id, w, h))
            .getOrElse(throw new IllegalStateException(
              s"fixture PNG for doc $id failed to decode"))
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = img.getWidth.toLong * img.getHeight
          ImageStats(id, img.getWidth, img.getHeight,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
  }

  // ---- real audio decode (javax.sound.sampled) ----------------------------

  /** Deterministic synthetic WAV fixture (RIFF + 16-bit mono PCM):
    * sample i of document d is `((37d + 73i) mod 4096) - 2048` — a pure
    * integer function of the data, and PCM is lossless, so decoded
    * sample statistics are replayable by the DuckDB oracle without any
    * audio library (q87, the audio twin of [[syntheticImageBytes]]). */
  def syntheticWavBytes(docId: Long, sampleRate: Int = 8000,
      n: Int = 256): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((docId * 37 + i.toLong * 73) % 4096) - 2048).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  /** REAL decode: `javax.sound.sampled.AudioSystem` parses the container
    * and format, and the PCM frames are materialized as 16-bit samples.
    * Undecodable bytes yield None — error-as-data, never a task failure. */
  private[ops] def decodeWav(payload: Array[Byte])
      : Option[(Int, Array[Short])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val bytes = ais.readAllBytes()
        val out = new Array[Short](bytes.length / 2)
        var i = 0
        if (fmt.isBigEndian)
          while (i < out.length) {
            out(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
            i += 1
          }
        else
          while (i < out.length) {
            out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
            i += 1
          }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }

  case class AudioStats(doc_id: Long, sample_rate: Int, n_samples: Long,
      rms: Double, zero_crossings: Long)

  /** Audio-decode statistics over the audio-modality slice: each executor
    * task generates the WAV fixture for its rows, runs the REAL
    * javax.sound decode, and folds exact integer sums over the decoded
    * samples. RMS is sqrt of an exact integer sum of squares and the
    * zero-crossing count is pure integer work, so both compare
    * bit-for-bit with the oracle's analytic replay of the generator. */
  def audioDecodeStats(spark: SparkSession, docs: DataFrame,
      sampleRate: Int = 8000, n: Int = 256): Dataset[AudioStats] = {
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (rate, samples) =
            decodeWav(syntheticWavBytes(id, sampleRate, n))
              .getOrElse(throw new IllegalStateException(
                s"fixture WAV for doc $id failed to decode"))
          var sumSq = 0L; var zc = 0L
          var i = 0
          while (i < samples.length) {
            val v = samples(i).toLong
            sumSq += v * v
            if (i > 0 && samples(i - 1).toLong * v < 0) zc += 1
            i += 1
          }
          AudioStats(id, rate, samples.length.toLong,
            math.sqrt(sumSq.toDouble / samples.length), zc)
        }
      }
  }
}

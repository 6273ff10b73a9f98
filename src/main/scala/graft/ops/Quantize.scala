package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 quantization for embedding columns — the standard
  * 4x storage/bandwidth shrink before ANN indexing or shipping vectors
  * across a 100 TB pipeline. Everything is per-row Column arithmetic
  * (codegen'd, zero shuffle): scale = max|v|/127, q_i = clamp(round(v_i /
  * scale)). All arithmetic is pinned to DOUBLE before any fold so the
  * DuckDB oracle replays bit-identically.
  */
object Quantize {

  private def d(x: Column): Column = x.cast("double")

  /** Per-vector scale: max absolute component / 127 (0 for a zero
    * vector, which then quantizes to all zeros). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(d(x)))) / lit(127.0)

  /** Quantized int8 components (array<bigint> for portability). */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          round(d(x) / scale).cast("long")))))

  /** Per-vector quantization report: scale, the quantized checksum
    * (exact integer sum — order-independent), count of saturated
    * components, and the max absolute reconstruction error. */
  def quantizationReport(emb: DataFrame, vecCol: String = "embedding")
      : DataFrame = {
    val v = col(vecCol)
    val scale = int8Scale(v)
    // the raw scale keeps an internal name: the output column "scale" is
    // rounded for display, and Spark's lateral column alias resolution
    // would otherwise bind the SAME-select references below to the
    // rounded alias instead of the child's raw value
    emb.select(col("vec_id"), v.as("v"), scale.as("s_raw"))
      .select(col("vec_id"), col("v"), col("s_raw"),
        int8Quantize(col("v"), col("s_raw")).as("q"))
      .select(
        col("vec_id"),
        round(col("s_raw"), 9).as("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
        size(filter(col("q"), x => abs(x) === 127L)).as("n_saturated"),
        round(array_max(zip_with(col("v"), col("q"),
          (x, q) => abs(d(x) - q.cast("double") * col("s_raw")))), 9)
          .as("max_err"))
      .orderBy(col("vec_id"))
  }
}

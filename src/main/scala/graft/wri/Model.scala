package graft.wri

import org.apache.spark.sql.types._

/** Core schemas + fixed project assumptions of the WRI pipeline.
  *
  * Mirrors the reference's layer-inventory table
  * (`metadata/all_layers_consistent.csv:1`, 21 columns; fields produced at
  * `scripts/R/utils.R:187-204` and `scripts/00b_extract_metadata_all.R:96-141`)
  * and the expected-value block (`00b:40-48`).
  */
object Model {

  /** Raw per-file metadata row (header extraction + classification +
    * validation), the engine's central record. */
  case class LayerMeta(
      filepath: String,
      filename: String,
      file_size_mb: Option[Double],
      nrows: Option[Int],
      ncols: Option[Int],
      nlayers: Option[Int],
      resolution_x: Option[Double],
      resolution_y: Option[Double],
      crs_epsg: Option[Int],
      extent_xmin: Option[Double],
      extent_xmax: Option[Double],
      extent_ymin: Option[Double],
      extent_ymax: Option[Double],
      datatype: Option[String],
      success: Boolean,
      error: Option[String],
      data_type: String,
      wri_domain: String,
      wri_dimension: Option[String],
      cog_filename: String,
      passes_assumptions: Option[Boolean],
      assumption_error: Option[String])

  /** Project assumptions validated per file (`00b:40-48`). */
  object Expected {
    val epsg = 5070
    val resX = 90.0
    val resY = 90.0
    val xmin = -5216639.67
    val xmax = -504689.6695
    val ymin = 991231.6885
    val ymax = 6199081.688
    val tol = 1e-6
  }

  /** Single datetime applied to every STAC item (`02b:56`). */
  val itemDatetime = "2026-06-05T00:00:00Z"

  /** Remote-hosting base URL for the HTTP HEAD probe (`02b:59`). */
  val knbBaseUrl =
    "https://knb.ecoinformatics.org/data/wri-data-processing/cogs/"

  val collectionId = "wri_ignitR"

  /** Explicit StructType of the inventory table (no schema inference —
    * the reference validates fixed schemas, `02b:112-123`). */
  val layerMetaSchema: StructType = StructType(Seq(
    StructField("filepath", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("file_size_mb", DoubleType),
    StructField("nrows", IntegerType),
    StructField("ncols", IntegerType),
    StructField("nlayers", IntegerType),
    StructField("resolution_x", DoubleType),
    StructField("resolution_y", DoubleType),
    StructField("crs_epsg", IntegerType),
    StructField("extent_xmin", DoubleType),
    StructField("extent_xmax", DoubleType),
    StructField("extent_ymin", DoubleType),
    StructField("extent_ymax", DoubleType),
    StructField("datatype", StringType),
    StructField("success", BooleanType, nullable = false),
    StructField("error", StringType),
    StructField("data_type", StringType, nullable = false),
    StructField("wri_domain", StringType, nullable = false),
    StructField("wri_dimension", StringType),
    StructField("cog_filename", StringType, nullable = false),
    StructField("passes_assumptions", BooleanType),
    StructField("assumption_error", StringType)))
}

package graft.wri

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path/filename classification of WRI layers as pure Column expressions
  * (SURVEY §2.2 P1-P4) — codegen'd `when`/`rlike` chains, no UDFs, so the
  * cheap classification runs BEFORE any raster I/O and Catalyst can push
  * the resulting exclude-filter to the file listing.
  *
  * Order-sensitive semantics ported from `scripts/R/utils.R:75-162`:
  * exclude patterns win first; `/indicators_no_mask/` does NOT match
  * `/indicators/` (underscore breaks the match) so no_mask files classify
  * exclude; the domain dictionary is scanned in its literal order.
  */
object Classify {

  /** The 11 known domain directory names (`utils.R:113-117`), in scan
    * order. */
  val domainDirs: Seq[String] = Seq(
    "air_quality", "biodiversity", "carbon", "communities",
    "infrastructure", "livelihoods", "natural_habitats",
    "sense_of_place", "sensitivity_analysis", "species", "water")

  /** basename(path) */
  def basename(path: Column): Column =
    element_at(split(path, "/"), -1)

  /** basename without the final extension (`tools::file_path_sans_ext`). */
  def stripExt(name: Column): Column =
    regexp_replace(name, "\\.[^.]*$", "")

  /** data_type in {indicator, aggregate, final_score, exclude}
    * (`utils.R:75-95`). */
  def dataType(path: Column): Column =
    when(path.rlike("/retro_|/archive/|/final_checks/"), "exclude")
      .when(path.rlike("/indicators/"), "indicator")
      .when(path.rlike("WRI_score\\.tif$"), "final_score")
      .when(path.rlike("_(domain_score|resilience|resistance|status)\\.tif$"),
        "aggregate")
      .otherwise("exclude")

  /** wri_domain (`utils.R:108-131`): parent dir of `/indicators/` first,
    * then the first dictionary name present as a path part, then the first
    * dictionary name contained in the filename, else "unknown". */
  def domain(path: Column): Column = {
    val parts = split(path, "/")
    val idx = array_position(parts, "indicators") // 1-based; 0 = absent
    val fromIndicators =
      when(idx > 1, element_at(parts, (idx - 1).cast("int")))
    val fromParts = domainDirs.foldRight(lit(null).cast("string")) {
      (d, elsE) => when(array_contains(parts, d), lit(d)).otherwise(elsE)
    }
    val name = basename(path)
    val fromName = domainDirs.foldRight(lit(null).cast("string")) {
      (d, elsE) => when(name.contains(d), lit(d)).otherwise(elsE)
    }
    coalesce(fromIndicators, fromParts, fromName, lit("unknown"))
  }

  /** wri_dimension (`utils.R:145-162`): filename infix for indicators,
    * suffix keyword scan for aggregates, NULL otherwise. */
  def dimension(dataType: Column, filename: Column): Column =
    when(dataType === "indicator",
      when(filename.rlike("_resistance_"), "resistance")
        .when(filename.rlike("_recovery_"), "recovery")
        .when(filename.rlike("_status_"), "status"))
      .when(dataType === "aggregate",
        when(filename.rlike("domain_score"), "domain_score")
          .when(filename.rlike("resilience"), "resilience")
          .when(filename.rlike("resistance"), "resistance")
          .when(filename.rlike("status"), "status"))

  /** cog_filename (`utils.R:49-57`): basename sans extension + ".tif",
    * with a "_no_mask" suffix for `/indicators_no_mask/` paths. */
  def cogFilename(path: Column): Column = {
    val base = stripExt(basename(path))
    when(path.rlike("/indicators_no_mask/"), concat(base, lit("_no_mask.tif")))
      .otherwise(concat(base, lit(".tif")))
  }

  /** R `all.equal`-style tolerance compare (`utils.R:35-37`): RELATIVE
    * to the first argument when it is meaningfully non-zero, absolute
    * otherwise — a naive abs(a-b)<tol differs for the large extent
    * values (SURVEY §7.4 risk 3). */
  def near(a: Column, b: Double, tol: Double = Model.Expected.tol): Column =
    when(abs(a) > tol, abs(a - b) / abs(a) <= tol)
      .otherwise(abs(a - b) <= tol)

  /** Assumption-validation cascade (`00b:105-141`): first failure wins;
    * returns the error message column (NULL = passes). Apply only to
    * successfully-read rows. */
  def assumptionError(
      epsg: Column, resX: Column, resY: Column,
      xmin: Column, xmax: Column, ymin: Column, ymax: Column): Column = {
    val e = Model.Expected
    // R's paste0 renders 30.0 as "30"; match that for whole numbers
    def fmt(c: Column): Column =
      when(c === c.cast("long").cast("double"), c.cast("long").cast("string"))
        .otherwise(c.cast("string"))
    when(epsg.isNull, "EPSG is NA")
      .when(epsg =!= e.epsg, concat(lit("EPSG mismatch ("), epsg, lit(")")))
      .when(!near(resX, e.resX) || !near(resY, e.resY),
        concat(lit("Resolution mismatch ("), fmt(resX), lit("x"), fmt(resY),
          lit(")")))
      .when(!near(xmin, e.xmin) || !near(xmax, e.xmax) ||
        !near(ymin, e.ymin) || !near(ymax, e.ymax), "Extent mismatch")
  }
}

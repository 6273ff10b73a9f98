package graft.wri

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifyGeoSpec extends SparkSpec {
  import spark.implicits._

  // truth table straight from utils.R:75-162 + the 82-row golden CSV
  private val cases = Seq(
    // path, data_type, domain, dimension, cog_filename
    ("data/WRI_score.tif", "final_score", "unknown", null, "WRI_score.tif"),
    ("data/air_quality/air_quality_domain_score.tif", "aggregate",
      "air_quality", "domain_score", "air_quality_domain_score.tif"),
    ("data/air_quality/air_quality_resilience.tif", "aggregate",
      "air_quality", "resilience", "air_quality_resilience.tif"),
    ("data/livelihoods/indicators/foo_resistance_x.tif", "indicator",
      "livelihoods", "resistance", "foo_resistance_x.tif"),
    ("data/iconic_places/indicators/ip_recovery_y.tif", "indicator",
      "iconic_places", "recovery", "ip_recovery_y.tif"),
    ("data/water/indicators/w_status_z.tif", "indicator", "water",
      "status", "w_status_z.tif"),
    ("data/water/archive/old_resilience.tif", "exclude", "water", null,
      "old_resilience.tif"),
    ("data/retro_2020/x_status.tif", "exclude", "unknown", null,
      "x_status.tif"),
    ("data/final_checks/check_status.tif", "exclude", "unknown", null,
      "check_status.tif"),
    // underscore breaks the /indicators/ match -> exclude (SURVEY §7.4)
    ("data/water/indicators_no_mask/w_status_z.tif", "exclude", "water",
      null, "w_status_z_no_mask.tif"),
    ("data/species/species_richness.tif", "exclude", "species", null,
      "species_richness.tif"),
    // domain from filename fallback
    ("data/misc/the_water_aggregate_status.tif", "aggregate", "water",
      "status", "the_water_aggregate_status.tif"))

  test("classification truth table (P1-P4)") {
    val df = cases.map(_._1).toDF("path").select(
      col("path"),
      Classify.dataType(col("path")).as("dt"),
      Classify.domain(col("path")).as("dom"),
      Classify.dimension(Classify.dataType(col("path")),
        Classify.basename(col("path"))).as("dim"),
      Classify.cogFilename(col("path")).as("cog"))
    val byPath = df.collect().map(r => r.getString(0) ->
      (r.getString(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    cases.foreach { case (p, dt, dom, dim, cog) =>
      val (gdt, gdom, gdim, gcog) = byPath(p)
      assert(gdt == dt, s"$p data_type: got $gdt want $dt")
      assert(gdom == dom, s"$p domain: got $gdom want $dom")
      assert(gdim == dim, s"$p dimension: got $gdim want $dim")
      assert(gcog == cog, s"$p cog: got $gcog want $cog")
    }
  }

  test("near: relative tolerance semantics (SURVEY §7.4 risk 3)") {
    val df = Seq(
      (-5216639.6695348294, Model.Expected.xmin), // true value vs rounded expected
      (991231.6884919972, Model.Expected.ymin)
    ).toDF("a", "b")
    val ok = df.select(Classify.near(col("a"), Model.Expected.xmin).as("x"))
    // xmin: |a-b| ~ 5e-4 absolute but 1e-10 relative -> must pass
    assert(ok.head().getBoolean(0))
    // absolute comparison would have failed:
    assert(math.abs(-5216639.6695348294 - Model.Expected.xmin) > 1e-6)
  }

  test("inverse Albers reproduces the published WGS84 bbox to 4dp") {
    val s = Geo.extentToStacSpatial(
      -5216639.6695348294, -504689.66953482945,
      991231.6884919972, 6199081.688491997)
    val got = s.bbox.map(Geo.round4)
    assert(got == Seq(-146.2082, 19.1074, 173.7109, 54.8056),
      s"bbox was $got")
    // ring is the rectangular bbox ring, closed
    assert(s.ring.length == 5 && s.ring.head == s.ring.last)
  }

  test("inverse Albers round-trips reference corner coordinates") {
    // meta.json cornerCoordinates: lowerLeft -> (-146.2082, 19.1074)ish
    val (lonLL, latLL) = Geo.inverse(-5216639.67, 991231.688).get
    assert(math.abs(lonLL - -146.2082286) < 1e-4, s"lonLL=$lonLL")
    assert(math.abs(latLL - 19.107369) < 1e-4, s"latLL=$latLL")
    val (lonUL, latUL) = Geo.inverse(-5216639.67, 6199081.688).get
    assert(math.abs(lonUL - 173.7109179) < 1e-4, s"lonUL=$lonUL")
    assert(math.abs(latUL - 54.8056149) < 1e-4, s"latUL=$latUL")
    // upper-right corner is beyond the pole: PROJ fails it, we drop it
    assert(Geo.inverse(-504689.67, 6199081.688).isEmpty)
  }

  test("forward Albers inverts the inverse to sub-millimeter, fixes the " +
      "projection origin, and forwardBox covers every point of the box") {
    // forward(inverse(x, y)) == (x, y) across the CONUS domain
    val pts = Seq(
      (-5216639.67, 991231.688), (-5216639.67, 6199081.688),
      (-504689.67, 991231.688), (12345.6, 2345678.9),
      (-2000000.0, 3000000.0), (2000000.0, 1500000.0))
    for ((x, y) <- pts; (lon, lat) <- Geo.inverse(x, y)) {
      val (fx, fy) = Geo.forward(lon, lat)
      assert(math.abs(fx - x) < 1e-3 && math.abs(fy - y) < 1e-3,
        s"($x, $y) round-tripped to ($fx, $fy)")
    }
    // the projection center (lon0=-96, lat0=23) maps to the false origin
    val (ox, oy) = Geo.forward(-96.0, 23.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6, s"origin ($ox, $oy)")
    // forwardBox must COVER the projected image of the whole lon/lat box
    // (conic edges curve — corner-only boxes clip; the fedex query box)
    val (bx0, by0, bx1, by1) = Geo.forwardBox(-122.0, 37.0, -121.0, 38.0)
    for (i <- 0 to 10; j <- 0 to 10) {
      val (px, py) = Geo.forward(-122.0 + i / 10.0, 37.0 + j / 10.0)
      assert(px >= bx0 - 5 && px <= bx1 + 5 && py >= by0 - 5 && py <= by1 + 5,
        s"point ($px, $py) outside forwardBox ($bx0, $by0, $bx1, $by1)")
    }
    // and the curvature is REAL: parallels arc away from lon0, so for a
    // box SPANNING the central meridian the bottom edge dips BELOW both
    // bottom corners at lon0 — the case corner-only projection clips
    // (which is why forwardBox densifies edges)
    val midBottom = Geo.forward(-96.0, 37.0)._2
    val cornerBottom = math.min(Geo.forward(-100.0, 37.0)._2,
      Geo.forward(-92.0, 37.0)._2)
    assert(midBottom < cornerBottom,
      s"expected edge sag at lon0: $midBottom vs $cornerBottom")
    val (_, sy0, _, _) = Geo.forwardBox(-100.0, 37.0, -92.0, 38.0)
    assert(sy0 <= midBottom, "forwardBox missed the mid-edge dip")
  }
}

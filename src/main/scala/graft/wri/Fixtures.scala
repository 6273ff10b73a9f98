package graft.wri

import java.nio.file.{Files, Paths}

/** Synthetic stage-00 input tree (FIXTURES.md §2): header-valid layers at
  * the reference's full-scale header values, plus every failure mode the
  * validation cascade must route to the inconsistent split.
  */
object Fixtures {
  import Model.Expected

  /** Real raster grid: 52355 x 57865 at 90 m covers the expected extent. */
  val W = 52355
  val H = 57865

  private val validGeo = TiffIO.GeoInfo(Expected.epsg, Expected.resX,
    Expected.resY, -5216639.6695348294, 6199081.688491997)

  /** Writes the fixture tree under `root/data`; idempotent. Returns the
    * data dir. */
  def writeInventoryTree(root: String): String = {
    val data = s"$root/data"
    def put(rel: String)(write: String => Unit): Unit = {
      val p = Paths.get(data, rel)
      Files.createDirectories(p.getParent)
      if (!Files.exists(p)) write(p.toString)
    }
    // valid layers (pass assumptions)
    put("WRI_score.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo))
    put("livelihoods/indicators/jobs_resistance_v1.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo))
    put("water/indicators/flow_recovery_v1.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo))
    put("water/water_resilience.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo))
    put("air_quality/air_quality_domain_score.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo))
    // inconsistent: wrong EPSG / wrong res / shifted extent
    put("carbon/indicators/c_status_epsg.tif")(
      TiffWriter.writeHeaderFixture(_, W, H, validGeo.copy(epsg = 4326)))
    put("carbon/indicators/c_status_res.tif")(
      TiffWriter.writeHeaderFixture(_, W, H,
        validGeo.copy(resX = 30.0, resY = 30.0)))
    put("carbon/indicators/c_status_extent.tif")(
      TiffWriter.writeHeaderFixture(_, W, H,
        validGeo.copy(xmin = validGeo.xmin + 1000)))
    // corrupt file -> success=false error row
    put("species/indicators/sp_status_corrupt.tif") { p =>
      Files.write(Paths.get(p), Array.fill[Byte](64)(0x7f))
    }
    // excluded before any I/O (never read)
    put("water/archive/old_water_resilience.tif") { p =>
      Files.write(Paths.get(p), Array[Byte](1, 2, 3))
    }
    put("water/indicators_no_mask/flow_recovery_v1.tif") { p =>
      Files.write(Paths.get(p), Array[Byte](1, 2, 3))
    }
    put("final_checks/check_status.tif") { p =>
      Files.write(Paths.get(p), Array[Byte](1, 2, 3))
    }
    data
  }

  /** Small REAL rasters (pixels included) for the COG conversion stage. */
  def writeCogInputs(root: String, n: Int = 4, w: Int = 96, h: Int = 64): Seq[(String, String)] = {
    val dir = s"$root/cog_src"
    Files.createDirectories(Paths.get(dir))
    (0 until n).map { i =>
      val p = s"$dir/layer_$i.tif"
      if (!Files.exists(Paths.get(p))) {
        val px = Array.tabulate(w * h)(j =>
          if ((j + i) % 13 == 0) Float.NaN else ((j * (i + 3)) % 101) / 7.0f)
        TiffWriter.writeGeoTiff(p, w, h, px,
          TiffIO.GeoInfo(Expected.epsg, Expected.resX, Expected.resY,
            validGeo.xmin, validGeo.ymax))
      }
      (p, s"layer_$i.tif")
    }
  }
}

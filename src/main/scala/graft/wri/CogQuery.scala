package graft.wri

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Windowed raster stats over written COGs, answered through the
  * range-read contract — the CONSUMPTION end of the reference pipeline
  * (its COGs exist precisely so clients can stream sub-windows without
  * downloading whole rasters; `README.md:329-335` checks exactly this
  * streaming access).
  *
  * Per layer: ONE bounded prefix read parses every pyramid level's tile
  * layout ([[TiffIO.levelLayoutsFromPrefix]] — the "single HEAD + first
  * 16 KB" COG discipline), the full-resolution tiles intersecting the
  * requested pixel window are computed from that layout, and ONLY those
  * tiles are fetched by byte range and decoded
  * ([[TiffIO.decodeLevelTile]]). A window over an N-tile raster reads
  * O(window tiles) bytes no matter how large the raster — the same
  * economics as q129's idx1-indexed video frame sampling.
  *
  * Windows address the raster either in PIXEL coordinates
  * ([[windowStats]]) or as a CRS bounding box ([[windowStatsGeo]]) —
  * the latter is how the reference's clients actually ask (an extent in
  * EPSG:5070 meters, not a tile index); the geotransform that places
  * the box onto the pixel grid parses from the SAME header prefix
  * ([[TiffIO.geoTransformFromPrefix]]), so the geographic form costs no
  * extra range request.
  *
  * Statistics are engine-exact: each decoded float is scaled to an
  * integer (`round(v * scale)` as a long, the q99/q124 fixed-point
  * discipline), so sums/mins/maxes are deterministic in any summation
  * order and a DuckDB oracle can replay them to the bit. NaN pixels (the
  * raster nodata convention) are counted, never aggregated.
  *
  * Scale shape: one task per layer file (mapPartitions over layer
  * names); layers are independent, so a 1000-layer catalog fans out
  * across executors exactly like the Cog.run encode stage.
  */
object CogQuery {

  case class CogWindowStat(
      layer: String,
      tiles_total: Long, tiles_read: Long,
      bytes_read: Long, file_bytes: Long,
      n_valid: Long, n_nan: Long,
      vs_sum: Long, vs_min: Option[Long], vs_max: Option[Long])

  /** The shared per-layer fold: fetch + decode exactly the tiles of
    * `layouts(level)` that intersect the half-open pixel window
    * [x0, xEnd) x [y0, yEnd) (already in that level's grid; may lie
    * partly or fully outside the raster — it is clamped here), and
    * aggregate scaled-integer stats. `prefixLen` counts toward
    * bytes_read (the one header range request already paid). */
  private def statsOverWindow(name: String, raf: RangeReader,
      fileLen: Long, prefixLen: Int, layouts: Seq[TiffIO.LevelLayout],
      level: Int, x0: Int, y0: Int, xEnd: Int, yEnd: Int,
      scale: Long): CogWindowStat = {
    require(level < layouts.length,
      s"$name has ${layouts.length} levels, requested $level")
    val full = layouts(level)
    val tw = full.tileWidth
    val th = full.tileHeight
    require(tw > 0 && th > 0, s"$name is not tiled — not a COG")
    val tilesAcross = (full.width + tw - 1) / tw
    val tilesDown = (full.height + th - 1) / th
    val xLo = math.max(0, x0); val xHi = math.min(full.width, xEnd)
    val yLo = math.max(0, y0); val yHi = math.min(full.height, yEnd)
    var tilesRead = 0L
    var bytesRead = prefixLen.toLong
    var nValid = 0L
    var nNan = 0L
    var vsSum = 0L
    var vsMin = Long.MaxValue
    var vsMax = Long.MinValue
    if (xLo < xHi && yLo < yHi) {
      val c0 = xLo / tw; val c1 = (xHi - 1) / tw
      val r0 = yLo / th; val r1 = (yHi - 1) / th
      var r = r0
      while (r <= r1) {
        var c = c0
        while (c <= c1) {
          val t = r * tilesAcross + c
          val cnt = full.tileByteCounts(t).toInt
          val buf = new Array[Byte](cnt)
          raf.readFully(full.tileOffsets(t), buf) // range req #2..k
          tilesRead += 1
          bytesRead += cnt
          val px = TiffIO.decodeLevelTile(full, buf)
          val pxLo = math.max(xLo, c * tw)
          val pxHi = math.min(xHi, (c + 1) * tw)
          val pyLo = math.max(yLo, r * th)
          val pyHi = math.min(yHi, (r + 1) * th)
          var y = pyLo
          while (y < pyHi) {
            var x = pxLo
            while (x < pxHi) {
              val v = px((y - r * th) * tw + (x - c * tw))
              if (java.lang.Float.isNaN(v)) nNan += 1
              else {
                val vs = Math.round(v.toDouble * scale)
                nValid += 1
                vsSum += vs
                if (vs < vsMin) vsMin = vs
                if (vs > vsMax) vsMax = vs
              }
              x += 1
            }
            y += 1
          }
          c += 1
        }
        r += 1
      }
    }
    CogWindowStat(name, tilesAcross.toLong * tilesDown, tilesRead,
      bytesRead, fileLen, nValid, nNan, vsSum,
      if (nValid == 0) None else Some(vsMin),
      if (nValid == 0) None else Some(vsMax))
  }

  private def withLayerReader[T](spark: SparkSession, cogDir: String,
      layers: Seq[String], prefixBytes: Int)(
      f: (String, RangeReader, Long, Array[Byte]) => T)(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.SerializableWritable(
        new org.apache.hadoop.conf.Configuration(
          spark.sparkContext.hadoopConfiguration)))
    spark.createDataset(layers).mapPartitions { it =>
      it.map { name =>
        val raf = RangeReader.open(s"$cogDir/$name", confBc.value.value)
        try {
          val fileLen = raf.length
          // range request #1: the bounded header prefix
          val pl = math.min(fileLen, prefixBytes.toLong).toInt
          val prefix = new Array[Byte](pl)
          raf.readFully(0L, prefix)
          f(name, raf, fileLen, prefix)
        } finally raf.close()
      }
    }
  }

  /** Stats of the pixel window [x0, x0+winW) x [y0, y0+winH) for each
    * named COG under `cogDir`, values scaled by `scale` before integer
    * aggregation. `level` selects the pyramid level to read (0 = full
    * resolution, 1+ = overviews — the ZOOM-OUT path: a coarse query
    * reads the small overview tiles and never touches full-res data,
    * which is why COGs carry pyramids at all); the window coordinates
    * are in THAT level's pixel grid. `prefixBytes` is the size of the
    * single header range request (the COG contract: it must cover the
    * whole IFD chain — [[TiffIO.levelLayoutsFromPrefix]] throws loudly
    * if not).
    *
    * `cogDir` may be a local path, any Hadoop scheme (`file://`,
    * `hdfs://`, ...), or an `http(s)://` base URL — each layer opens
    * through [[RangeReader]], so the prefix+tile byte-range economy is
    * identical whether the raster sits on local disk, a cluster
    * filesystem, or behind the reference's hosted-COG HTTP serving
    * mode. The session's Hadoop configuration rides to executors in a
    * broadcast so scheme credentials/settings resolve there too. */
  def windowStats(spark: SparkSession, cogDir: String, layers: Seq[String],
      x0: Int, y0: Int, winW: Int, winH: Int,
      scale: Long = 10000L, prefixBytes: Int = 16 * 1024,
      level: Int = 0): DataFrame = {
    import spark.implicits._
    require(x0 >= 0 && y0 >= 0 && winW > 0 && winH > 0,
      s"window must be non-empty and non-negative: ($x0,$y0) ${winW}x$winH")
    require(scale >= 1, s"scale must be >= 1: $scale")
    require(level >= 0, s"level must be >= 0: $level")
    require(layers.nonEmpty, "no layers to query")
    withLayerReader(spark, cogDir, layers, prefixBytes) {
      (name, raf, fileLen, prefix) =>
        statsOverWindow(name, raf, fileLen, prefix.length,
          TiffIO.levelLayoutsFromPrefix(prefix), level,
          x0, y0, x0 + winW, y0 + winH, scale)
    }.toDF()
  }

  /** Stats of the CRS bounding box [minx, maxx] x [miny, maxy] (the
    * raster's own projected coordinates — EPSG:5070 meters for the WRI
    * catalog) for each named COG under `cogDir`: the way the
    * reference's clients actually address rasters. The geotransform
    * parses from the SAME single header prefix as the tile layout, so
    * the geographic form costs no extra range request; the box maps to
    * the pixel grid under the pixel-is-area convention — every pixel
    * whose cell intersects the box is included:
    * `x0 = floor((minx - gx) / resX)`, `xEnd = ceil((maxx - gx) /
    * resX)` (and the y axis mirrored from the top edge), clamped to the
    * raster. A box wholly outside the raster reads zero tiles and
    * reports zero counts. `level` selects the pyramid level — the
    * geographic ZOOM-OUT path: the geotransform names the level-0
    * grid, so level L's cell size scales by `width0 / widthL` per axis
    * (exact powers of two for the writer's own pyramids) and the same
    * floor/ceil mapping runs on that coarser grid; a broad box at a
    * deep level reads a handful of overview tiles and never touches
    * full-res data. */
  def windowStatsGeo(spark: SparkSession, cogDir: String,
      layers: Seq[String],
      minx: Double, miny: Double, maxx: Double, maxy: Double,
      scale: Long = 10000L, prefixBytes: Int = 16 * 1024,
      level: Int = 0): DataFrame = {
    import spark.implicits._
    require(maxx > minx && maxy > miny,
      s"box must be non-empty: x [$minx, $maxx], y [$miny, $maxy]")
    require(scale >= 1, s"scale must be >= 1: $scale")
    require(level >= 0, s"level must be >= 0: $level")
    require(layers.nonEmpty, "no layers to query")
    withLayerReader(spark, cogDir, layers, prefixBytes) {
      (name, raf, fileLen, prefix) =>
        val layouts = TiffIO.levelLayoutsFromPrefix(prefix)
        require(level < layouts.length,
          s"$name has ${layouts.length} levels, requested $level")
        val (resX0, resY0, gx, gy) = TiffIO.geoTransformFromPrefix(prefix)
        val l0 = layouts.head
        val lv = layouts(level)
        val resX = resX0 * l0.width.toDouble / lv.width
        val resY = resY0 * l0.height.toDouble / lv.height
        val x0 = math.floor((minx - gx) / resX).toInt
        val xEnd = math.ceil((maxx - gx) / resX).toInt
        val y0 = math.floor((gy - maxy) / resY).toInt
        val yEnd = math.ceil((gy - miny) / resY).toInt
        statsOverWindow(name, raf, fileLen, prefix.length, layouts, level,
          x0, y0, xEnd, yEnd, scale)
    }.toDF()
  }
}

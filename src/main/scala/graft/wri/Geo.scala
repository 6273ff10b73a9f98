package graft.wri

/** Geodesy for the WRI pipeline: inverse Albers Equal Area (EPSG:5070,
  * NAD83/Conus Albers) to lon/lat, and the STAC bbox/ring construction
  * (SURVEY §2.7 F10; `utils.R:228-262`).
  *
  * Projection parameters are hard-coded from the reference COG's CRS WKT
  * (`meta.json` coordinateSystem: Albers Equal Area EPSG:9822, lat0=23,
  * lon0=-96, sp1=29.5, sp2=45.5, FE=FN=0, GRS80 ellipsoid). NAD83 and
  * WGS84 are treated as equivalent, exactly as the reference's sf
  * transform does for this dataset.
  *
  * Formulas: ellipsoidal Albers Equal Area, J.P. Snyder, "Map Projections
  * — A Working Manual" (USGS PP 1395), pp. 101-102 — public domain.
  */
object Geo {

  // GRS80
  private val a = 6378137.0
  private val invF = 298.257222101
  private val f = 1.0 / invF
  private val e2 = f * (2 - f)
  private val e = math.sqrt(e2)

  private val lat0 = math.toRadians(23.0)
  private val lon0 = math.toRadians(-96.0)
  private val sp1 = math.toRadians(29.5)
  private val sp2 = math.toRadians(45.5)

  private def mOf(phi: Double): Double =
    math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))

  private def qOf(phi: Double): Double = {
    val s = math.sin(phi)
    (1 - e2) * (s / (1 - e2 * s * s) -
      (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
  }

  private val m1 = mOf(sp1)
  private val m2 = mOf(sp2)
  private val q0 = qOf(lat0)
  private val q1 = qOf(sp1)
  private val q2 = qOf(sp2)
  private val n = (m1 * m1 - m2 * m2) / (q2 - q1)
  private val bigC = m1 * m1 + n * q1
  private val rho0 = a * math.sqrt(bigC - n * q0) / n

  private val qPole = qOf(math.Pi / 2)

  /** Inverse projection: EPSG:5070 meters -> (lon, lat) degrees, longitude
    * normalized to [-180, 180].
    *
    * Returns None for points outside the projection's valid domain
    * (|q| beyond the pole value) — PROJ fails those too, which is why the
    * reference dataset's upper-right corner is absent from meta.json's
    * wgs84Extent (a triangle, not a quad). The bbox semantics depend on
    * dropping them. */
  def inverse(x: Double, y: Double): Option[(Double, Double)] = {
    val rho = math.sqrt(x * x + (rho0 - y) * (rho0 - y))
    val theta = math.atan2(x, rho0 - y) // n > 0 for this CRS
    val q = (bigC - rho * rho * n * n / (a * a)) / n
    val phiOpt =
      if (math.abs(q) >= qPole) {
        if (math.abs(math.abs(q) - qPole) < 1e-9)
          Some(math.copySign(math.Pi / 2, q))
        else None // beyond the pole: no inverse
      } else {
        var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
        var i = 0
        while (i < 25) {
          val s = math.sin(phi)
          val one = 1 - e2 * s * s
          val corr = (one * one) / (2 * math.cos(phi)) *
            (q / (1 - e2) - s / one +
              (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
          phi += corr
          i += 1
          if (math.abs(corr) < 1e-12) i = 25
        }
        Some(phi)
      }
    phiOpt.map { phi =>
      val lon = math.toDegrees(lon0 + theta / n)
      val wrapped = ((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
      (wrapped, math.toDegrees(phi))
    }
  }

  /** STAC spatial info: bbox + rectangular GeoJSON ring in EPSG:4326.
    *
    * Replicates the PRODUCTION semantics (`utils.R:228-262`): transform
    * the four native-CRS corners, take the min/max as bbox (which yields
    * the reference's odd-looking lon span from -146.2 to 173.7 — the
    * upper-left corner crosses the antimeridian), then build the ring
    * directly from the bbox (SW, SE, NE, NW, SW) to avoid the degenerate
    * polygons naive corner rings produce. */
  case class StacSpatial(bbox: Seq[Double], ring: Seq[(Double, Double)])

  def extentToStacSpatial(
      xmin: Double, xmax: Double, ymin: Double, ymax: Double): StacSpatial = {
    val corners = Seq(
      inverse(xmin, ymin), inverse(xmax, ymin),
      inverse(xmax, ymax), inverse(xmin, ymax)).flatten
    require(corners.nonEmpty, "entire extent outside projection domain")
    val lons = corners.map(_._1); val lats = corners.map(_._2)
    val bbox = Seq(lons.min, lats.min, lons.max, lats.max)
    val ring = Seq(
      (bbox(0), bbox(1)), (bbox(2), bbox(1)),
      (bbox(2), bbox(3)), (bbox(0), bbox(3)), (bbox(0), bbox(1)))
    StacSpatial(bbox, ring)
  }

  /** Forward projection: (lon, lat) degrees -> EPSG:5070 meters — the
    * direction a CLIENT needs when its query box arrives in WGS84
    * lon/lat (the fedex `get_layer(name, bbox)` call) and the raster
    * grid speaks Albers meters. Snyder pp. 98-100 (the same public-
    * domain formulas [[inverse]] iterates backwards); λ−λ0 wraps into
    * (-π, π] so a box near the antimeridian projects on the near side,
    * matching how [[inverse]] normalizes longitudes. Total for
    * |lat| <= 90 — the forward direction has no domain hole. */
  def forward(lon: Double, lat: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    var dl = math.toRadians(lon) - lon0
    while (dl > math.Pi) dl -= 2 * math.Pi
    while (dl < -math.Pi) dl += 2 * math.Pi
    val theta = n * dl
    val rho = a * math.sqrt(bigC - n * qOf(phi)) / n
    (rho * math.sin(theta), rho0 - rho * math.cos(theta))
  }

  /** Project a WGS84 lon/lat box to its EPSG:5070 bounding box. Conic
    * edges curve, so corner-only projection would clip the true image
    * along the top/bottom edges (max northing can sit mid-edge);
    * each edge is densified with `samplesPerEdge` points before the
    * min/max — the standard GIS practice (and what sf's
    * st_transform-then-st_bbox effectively does on densified
    * geometry). Driver-side scalar math: 4 x samples projections. */
  def forwardBox(lonMin: Double, latMin: Double, lonMax: Double,
      latMax: Double, samplesPerEdge: Int = 32): (Double, Double, Double, Double) = {
    require(lonMax > lonMin && latMax > latMin,
      s"box must be non-empty: lon [$lonMin, $lonMax], lat [$latMin, $latMax]")
    val pts = (0 to samplesPerEdge).flatMap { i =>
      val t = i.toDouble / samplesPerEdge
      val lon = lonMin + t * (lonMax - lonMin)
      val lat = latMin + t * (latMax - latMin)
      Seq((lon, latMin), (lon, latMax), (lonMin, lat), (lonMax, lat))
    }.map { case (lo, la) => forward(lo, la) }
    (pts.map(_._1).min, pts.map(_._2).min,
      pts.map(_._1).max, pts.map(_._2).max)
  }

  /** Codegen-friendly scalar forms (static forwarders callable from
    * generated Java; NaN = outside projection domain). */
  def inverseLonJava(x: Double, y: Double): Double =
    inverse(x, y).map(_._1).getOrElse(Double.NaN)
  def inverseLatJava(x: Double, y: Double): Double =
    inverse(x, y).map(_._2).getOrElse(Double.NaN)

  /** jsonlite-style 4-significant-decimal rounding used at serialization
    * time by the reference (`write_json` default digits=4). */
  def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
}

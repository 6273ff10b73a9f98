package graft.functions

import graft.SparkSpec
import graft.wri.Geo
import org.apache.spark.sql.functions._

class AlbersExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native albers_lon/albers_lat match Geo.inverse through SQL") {
    GraftFunctions.register(spark)
    val df = Seq(
      (-5216639.67, 991231.688),   // LL corner
      (-5216639.67, 6199081.688),  // UL corner (antimeridian wrap)
      (-504689.67, 991231.688)     // LR corner
    ).toDF("x", "y")
    val got = df.selectExpr("albers_lon(x, y) AS lon", "albers_lat(x, y) AS lat")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val want = Seq(
      Geo.inverse(-5216639.67, 991231.688).get,
      Geo.inverse(-5216639.67, 6199081.688).get,
      Geo.inverse(-504689.67, 991231.688).get)
    got.zip(want).foreach { case ((glon, glat), (wlon, wlat)) =>
      assert(glon == wlon && glat == wlat)
    }
  }

  test("out-of-domain point yields NaN; nulls propagate") {
    GraftFunctions.register(spark)
    val r = Seq((-504689.67, 6199081.688)).toDF("x", "y")
      .selectExpr("albers_lat(x, y) AS lat").head()
    assert(r.getDouble(0).isNaN)
    val n = Seq((Some(1.0), Option.empty[Double])).toDF("x", "y")
      .selectExpr("albers_lon(x, y) AS lon").head()
    assert(n.isNullAt(0))
  }

  test("GraftExtensions injects the native functions at session creation") {
    // force a NEW session over the shared SparkContext so the extensions
    // hook actually runs (getOrCreate would return the active session)
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master(spark.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        """SELECT albers_lat(-2000000.0D, 3000000.0D) AS lat,
          |  token_hashes('ab cd') AS th,
          |  hashed_ngrams('a b c d', 3) AS hg,
          |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ic
          |""".stripMargin).head()
      assert(r.getDouble(0) > 40 && r.getDouble(0) < 55)
      assert(r.getSeq[Long](1).length == 2)
      assert(r.getSeq[Long](2).length == 2)
      assert(r.getInt(3) == 2)
    } finally {
      active.foreach { s =>
        org.apache.spark.sql.SparkSession.setActiveSession(s)
        org.apache.spark.sql.SparkSession.setDefaultSession(s)
      }
    }
  }

  test("expression participates in WholeStageCodegen") {
    GraftFunctions.register(spark)
    val df = spark.range(3).selectExpr(
      "albers_lat(CAST(-2000000 + id * 1000 AS DOUBLE), CAST(3000000 AS DOUBLE)) AS lat")
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [albers_lat"), s"no codegen in:\n$p")
    assert(df.collect().forall(r => r.getDouble(0) > 40 && r.getDouble(0) < 55))
  }
}

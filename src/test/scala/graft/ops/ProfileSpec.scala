package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile reports per-column stats including nulls") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 40.0))
      .toDF("a", "b")
    val rows = Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("a")
    assert(a.getLong(1) == 3L && a.getLong(2) == 1L && a.getLong(3) == 2L)
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 2.0)
    val b = rows("b")
    assert(b.getLong(1) == 3L && b.getLong(2) == 1L && b.getLong(3) == 3L)
    assert(b.getDouble(4) == 10.0 && b.getDouble(5) == 40.0)
  }

  test("numericProfile is a single job over one aggregation") {
    val df = graft.Tables.lineitem(spark, sfDir)
    val plan = Profile.numericProfile(df, Seq("l_quantity", "l_tax"))
      .queryExecution.executedPlan.toString
    // one scan feeds every statistic: no self-joins or repeated scans
    assert("FileScan|Scan parquet".r.findAllIn(plan).length <= 1,
      s"profile should scan once:\n$plan")
  }
}

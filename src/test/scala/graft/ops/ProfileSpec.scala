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

  test("numericProfileApprox: aggregator sketch equals the Column-level " +
      "hllDistinct estimate, counts equal the exact profile") {
    val df = graft.Tables.lineitem(spark, sfDir)
    val cols = Seq("l_orderkey", "l_partkey")
    val approx = Profile.numericProfileApprox(df, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.numericProfile(df, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      // two independent formulations of the SAME portable sketch must
      // land on the identical rounded estimate
      val est = Sketches.hllDistinct(df, c).collect().head.getDouble(0)
      assert(approx(c).getDouble(3) == est,
        s"$c: aggregator ${approx(c).getDouble(3)} != column $est")
      // everything that isn't the sketch is exact and must match
      assert(approx(c).getLong(1) == exact(c).getLong(1))
      assert(approx(c).getLong(2) == exact(c).getLong(2))
      assert(approx(c).getDouble(4) == exact(c).getDouble(4))
      assert(approx(c).getDouble(5) == exact(c).getDouble(5))
    }
  }

  test("numericProfileApprox skips nulls like count_distinct does") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 40.0))
      .toDF("a", "b")
    val rows = Profile.numericProfileApprox(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    // a null must contribute NOTHING to the sketch: the estimate over
    // the null-bearing column equals the estimate over its null-free twin
    val aTwin = Sketches.hllDistinct(
      Seq(1.0, 2.0, 2.0).toDF("a"), "a").collect().head.getDouble(0)
    val bTwin = Sketches.hllDistinct(
      Seq(10.0, 30.0, 40.0).toDF("b"), "b").collect().head.getDouble(0)
    assert(rows("a").getDouble(3) == aTwin)
    assert(rows("b").getDouble(3) == bTwin)
    assert(rows("a").getLong(2) == 1L && rows("b").getLong(2) == 1L)
  }

  test("numericProfileApprox estimates 0 for a column with no values, " +
      "matching count_distinct") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (null, 1.0), (null, 2.0)).toDF("a", "b")
    val r = Profile.numericProfileApprox(df, Seq("a"))
      .collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.0,
      s"empty sketch must report 0, got ${r.getDouble(3)}")
  }
}

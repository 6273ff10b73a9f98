package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §2.4 note: Spark built-ins cover the
  * sketch surface — HLL++ via approx_count_distinct, quantile sketches
  * via approx_percentile). Accuracy is implementation-defined so there is
  * no cross-engine oracle; assert error bounds against exact values. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on every key column") {
    val li = Tables.lineitem(spark, sfDir)
    // rsd 0.01: default 0.05 measured 6.4% off on l_partkey at sf0.001
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact_o"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("apx_o"),
      countDistinct(col("l_partkey")).as("exact_p"),
      approx_count_distinct(col("l_partkey"), 0.01).as("apx_p")).head()
    def relErr(e: Long, a: Long) = math.abs(a - e).toDouble / e
    assert(relErr(r.getLong(0), r.getLong(1)) < 0.05)
    assert(relErr(r.getLong(2), r.getLong(3)) < 0.05)
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.orders(spark, sfDir)
    val r = o.agg(
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("apx"),
      expr("median(o_totalprice)").as("exact")).head()
    val apx = r.getDouble(0); val exact = r.getDouble(1)
    assert(math.abs(apx - exact) / exact < 0.02,
      s"apx=$apx exact=$exact")
  }

  test("HLL sketches merge without re-scan, inside the error bound") {
    // the property that matters at scale: sketch once per partition/day,
    // merge later — no re-scan. Spark 4 ships DataSketches HLL natively.
    val li = Tables.lineitem(spark, sfDir)
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 === 1)
    val whole = li.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))")).head().getLong(0)
    val sketches = a.agg(expr("hll_sketch_agg(l_orderkey)").as("s")).unionAll(
      b.agg(expr("hll_sketch_agg(l_orderkey)").as("s")))
    val merged = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(s))")).head().getLong(0)
    // the union path re-represents registers, so merged and single-pass
    // estimates differ slightly; both must sit inside the HLL error bound
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    assert(math.abs(whole - exact).toDouble / exact < 0.05,
      s"whole=$whole exact=$exact")
    assert(math.abs(merged - whole).toDouble / exact < 0.02,
      s"merged=$merged vs whole=$whole drifted")
  }
}

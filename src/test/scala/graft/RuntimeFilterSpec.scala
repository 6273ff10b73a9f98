package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: for a selective build side, Spark
  * injects a bloom filter on the probe side's join key so most probe
  * rows die at the scan instead of riding the shuffle — at 100 TB this
  * is the difference between shuffling the whole fact table and
  * shuffling the matching slice. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom filter on the probe side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // sf0.001 relations are tiny; drop the size gates so the rewrite fires
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val sel = Tables.orders(spark, sfDir)
        .filter(col("o_totalprice") > 400000) // selective build side
      val joined = Tables.lineitem(spark, sfDir)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter"),
        s"no runtime bloom filter in:\n$optimized")
      // and it must not change the answer
      val expect = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir)
          .filter(col("o_totalprice") > 400000).hint("broadcast"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}

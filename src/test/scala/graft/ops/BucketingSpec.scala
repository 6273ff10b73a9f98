package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed joins must eliminate the shuffle — checked against the plan,
  * and results checked against the plain (shuffled) join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
    assert(Bucketing.isShuffleFree(joined),
      s"shuffle present:\n${joined.queryExecution.executedPlan}")
    // same result as the plain shuffled join
    val plainCount = li.join(o, "l_orderkey").count()
    assert(joined.count() == plainCount)
    // and an aggregation on the bucket key also avoids the shuffle
    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity"))
    assert(Bucketing.isShuffleFree(agg),
      s"agg shuffled:\n${agg.queryExecution.executedPlan}")
  }

  test("writeBucketed sweeps an orphaned table location through the " +
      "warehouse path's own filesystem (the WriFs seam)") {
    // a location left by another session is not in this catalog; the
    // sweep must go through the warehouse's Hadoop FileSystem, not
    // java.nio (an hdfs:// warehouse would throw on Paths.get)
    val loc = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/orphan_b"
    val fs = graft.wri.WriFs.fs(loc,
      spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS orphan_b")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$loc/junk"))
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity").limit(10)
    Bucketing.writeBucketed(li, "orphan_b", "l_orderkey", 4)
    assert(spark.table("orphan_b").count() == 10)
  }
}

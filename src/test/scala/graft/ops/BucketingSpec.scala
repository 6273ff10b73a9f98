package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed joins must eliminate the shuffle — checked against the plan,
  * and results checked against the plain (shuffled) join.
  *
  * The join assertions run with auto-broadcast DISABLED (both the static
  * and the AQE threshold): at test scale Spark would otherwise broadcast
  * the small side, and a broadcast plan contains no shuffle exchange even
  * over UNBUCKETED tables — the pin would pass for the wrong reason. With
  * broadcast off, the property actually planned is the one that pays at
  * 100 TB fact-fact scale: a co-located SortMergeJoin with zero Exchange
  * of any kind and zero Sort above the pre-sorted bucket scans. Each
  * positive pin is paired with a mutation that must FAIL it (unbucketed
  * input, mismatched bucket counts), so a silent regression — dropped
  * `bucketBy`, drifted counts, bucketing disabled — cannot pass. */
class BucketingSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // the shared pin triple (Bucketing.colocatedConfs): broadcast off +
  // the bucketed-scan ordering report that elides the Sort nodes
  private def noBroadcast[T](f: => T): T =
    withConf(Bucketing.colocatedConfs: _*)(f)

  test("bucketed fact-fact join plans a co-located SortMergeJoin: " +
      "zero Exchange of any kind, zero Sort above the bucket scans") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)
    noBroadcast {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      // result check first — the inspector then sees the already-final
      // adaptive plan and runs nothing
      assert(joined.count() == li.join(o, "l_orderkey").count())
      assert(Bucketing.isColocatedMergeJoin(joined),
        s"not a co-located merge join:\n${joined.queryExecution.executedPlan}")
    }
    // and an aggregation on the bucket key also avoids the shuffle
    val agg = spark.table("li_b").groupBy("l_orderkey")
      .agg(sum("l_quantity"))
    assert(Bucketing.isShuffleFree(agg),
      s"agg shuffled:\n${agg.queryExecution.executedPlan}")
  }

  test("mutations fail the pin: unbucketed inputs and mismatched bucket " +
      "counts both plan an Exchange under the same confs") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    noBroadcast {
      // dropped bucketBy: the plain join must NOT satisfy the pin
      assert(!Bucketing.isColocatedMergeJoin(li.join(o, "l_orderkey")),
        "plain unbucketed join passed the co-located pin")
      // mismatched bucket counts (coalescing off by default): at least
      // one side re-shuffles, so the pin must fail
      Bucketing.writeBucketed(li, "li_b4", "l_orderkey", 4)
      Bucketing.writeBucketed(o, "o_b8", "l_orderkey", 8)
      val mismatched =
        Bucketing.bucketedJoin(spark, "li_b4", "o_b8", "l_orderkey")
      assert(!Bucketing.isColocatedMergeJoin(mismatched),
        s"mismatched bucket counts passed:\n${mismatched.queryExecution.executedPlan}")
    }
    // a broadcast join over UNBUCKETED tables was exactly the round-10
    // false positive: it has no Exchange hashpartitioning, but it DOES
    // have a BroadcastExchange — the tightened helper must reject it
    val broadcastJoin = li.join(broadcast(o), "l_orderkey")
    broadcastJoin.count()
    assert(!Bucketing.isShuffleFree(broadcastJoin),
      "broadcast plan slipped through isShuffleFree")
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

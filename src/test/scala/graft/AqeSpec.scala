package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors the 100 TB design leans on: the
  * runtime skew-join split (hot keys divided across tasks without
  * salting) and post-shuffle partition coalescing. Asserted on the final
  * adaptive plan, not assumed. */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      // force SMJ (no broadcast) and make the skew thresholds small
      // enough that the synthetic hot key triggers the optimization
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.shuffle.partitions" -> "16") {
      // key 0 holds ~100k of 110k rows: one hot shuffle partition
      val left = spark.range(0, 110000)
        .select(when($"id" < 100000, 0L).otherwise($"id").as("k"),
          $"id".as("payload"))
      val right = spark.range(0, 500).select($"id".as("k"),
        ($"id" * 2).as("dim"))
      val joined = left.join(right, "k")
      // execute THIS dataframe's own adaptive plan (count() would build a
      // separate QueryExecution and leave joined's stages unmaterialized)
      val n = joined.collect().length
      assert(n == 100000) // all matches come from the hot key 0
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "no adaptive plan")
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"skew-join split did not fire:\n$finalPlan")
    }
  }

  test("AQE coalesces small post-shuffle partitions") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "200") {
      // tiny aggregate: 200 shuffle partitions must collapse to a few
      val agg = Tables.nation(spark, sfDir).groupBy($"n_regionkey")
        .agg(count(lit(1)).as("n"))
      assert(agg.count() == 5)
      val parts = agg.rdd.getNumPartitions
      assert(parts < 20, s"AQE did not coalesce: $parts partitions")
    }
  }
}

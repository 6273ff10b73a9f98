package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UdafsSpec extends SparkSpec {
  import spark.implicits._

  test("geometric mean truth table") {
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 5.0), ("b", -1.0), ("b", 0.0))
      .toDF("k", "x")
    val got = df.groupBy($"k").agg(Udafs.geoMean($"x").as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 4.0) < 1e-12)       // sqrt(2*8)
    assert(math.abs(got("b") - 5.0) < 1e-12)       // non-positive ignored
  }

  test("the aggregator plans two-phase (partial before the shuffle)") {
    val plan = graft.Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority").agg(Udafs.geoMean($"o_totalprice"))
      .queryExecution.executedPlan.toString
    assert("(ObjectHashAggregate|HashAggregate|SortAggregate)".r
      .findAllIn(plan).length >= 2, s"no partial aggregation:\n$plan")
    assert(plan.contains("partial"), s"no partial phase marker:\n$plan")
  }
}

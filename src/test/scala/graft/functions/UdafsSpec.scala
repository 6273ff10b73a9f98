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

  test("bounded top-k aggregator matches the window formulation") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 3.0, 3L),
      ("a", 2.0, 4L), ("b", 9.0, 5L)).toDF("k", "score", "id")
    val got = df.groupBy($"k")
      .agg(Udafs.topK(2, $"score", $"id").as("top"))
      .select($"k", $"top").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x =>
          (x.getDouble(0), x.getLong(1)))).toMap
    // score tie (3.0): larger id first, like ORDER BY score DESC, id DESC
    assert(got("a") == Seq((3.0, 3L), (3.0, 2L)))
    assert(got("b") == Seq((9.0, 5L)))
    // real data: q65's aggregator result equals the q11-style window top-k
    val topAgg = graft.SparkEntry.queries("q65_topk_aggregator")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".desc)
    val topWin = graft.Tables.customer(spark, sfDir)
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .orderBy($"c_mktsegment", $"rank")
      .collect().map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Int]("rank"), r.getAs[Long]("c_custkey"))).toSeq
    assert(topAgg == topWin)
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

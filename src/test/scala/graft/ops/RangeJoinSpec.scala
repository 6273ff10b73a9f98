package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points =
    Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_shipdate")
  private lazy val windows =
    Tables.orders(spark, sfDir).filter($"o_totalprice" > 400000)
      .select($"o_orderkey".as("w_key"), $"o_orderdate".as("w_start"),
        ($"o_orderdate" + expr("INTERVAL 14 DAYS")).as("w_end"))

  test("binned interval join equals the naive theta join") {
    val binned = RangeJoin.pointInInterval(points, "l_shipdate",
        windows, "w_start", "w_end", binSeconds = 5L * 86400)
      .select($"l_orderkey", $"l_shipdate", $"w_key")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    val naive = points.join(windows,
        $"l_shipdate" >= $"w_start" && $"l_shipdate" < $"w_end")
      .select($"l_orderkey", $"l_shipdate", $"w_key")
      .collect().map(r => (r.getLong(0), r.get(1).toString, r.getLong(2))).toSet
    assert(binned.nonEmpty, "no interval matches in the spec corpus")
    assert(binned == naive,
      s"drift: missing=${(naive -- binned).take(3)} extra=${(binned -- naive).take(3)}")
  }

  test("bin width does not change results (only duplication factor)") {
    def run(bin: Long) = RangeJoin.pointInInterval(points, "l_shipdate",
        windows, "w_start", "w_end", binSeconds = bin)
      .select($"l_orderkey", $"w_key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(86400) == run(30L * 86400))
  }

  test("window bounds are half-open [start, end)") {
    val p = Seq(("2024-01-01 00:00:00", 1L), ("2024-01-08 00:00:00", 2L))
      .toDF("ts", "pid").select($"ts".cast("timestamp").as("ts"), $"pid")
    val w = Seq(("2024-01-01 00:00:00", "2024-01-08 00:00:00", 10L))
      .toDF("ws", "we", "wid")
      .select($"ws".cast("timestamp").as("ws"), $"we".cast("timestamp").as("we"),
        $"wid")
    val got = RangeJoin.pointInInterval(p, "ts", w, "ws", "we")
      .select($"pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"got $got") // start inclusive, end exclusive
  }

  test("plan is an equi-join on the bin key, never a nested loop") {
    val physical = RangeJoin.pointInInterval(points, "l_shipdate",
        windows, "w_start", "w_end")
      .queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"), physical)
  }
}

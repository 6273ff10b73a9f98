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

  private def iv(rows: Seq[(Long, String, String)], id: String, s: String,
      e: String) =
    rows.toDF(id, "s", "e").select(col(id),
      $"s".cast("timestamp").as(s), $"e".cast("timestamp").as(e))

  test("intervalOverlap matches the naive theta join, each pair once") {
    val a = iv(Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
      (2L, "2024-01-05 00:00:00", "2024-01-06 00:00:00"),
      (3L, "2024-02-01 00:00:00", "2024-02-02 00:00:00")), "aid", "as_", "ae")
    val b = iv(Seq(
      (10L, "2024-01-09 00:00:00", "2024-01-12 00:00:00"), // overlaps 1
      (11L, "2024-01-05 12:00:00", "2024-01-05 13:00:00"), // inside 1 and 2
      (12L, "2024-03-01 00:00:00", "2024-03-02 00:00:00")), "bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be",
        binSeconds = 86400)
      .select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, s"pair emitted twice: $got")
    val naive = a.join(b, $"as_" < $"be" && $"bs" < $"ae")
      .select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == naive.toSet, s"got=${got.toSet} naive=${naive.toSet}")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (2L, 11L)))
  }

  test("intervalOverlap: touching half-open intervals do NOT overlap") {
    val a = iv(Seq((1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")),
      "aid", "as_", "ae")
    val b = iv(Seq((2L, "2024-01-02 00:00:00", "2024-01-03 00:00:00")),
      "bid", "bs", "be")
    assert(RangeJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be")
      .count() == 0)
  }

  test("intervalOverlap: bin width changes duplication, never results") {
    val a = iv(Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-20 00:00:00"),
      (2L, "2024-01-15 00:00:00", "2024-01-16 00:00:00")), "aid", "as_", "ae")
    val b = iv(Seq(
      (10L, "2024-01-14 00:00:00", "2024-01-21 00:00:00"),
      (11L, "2024-01-02 00:00:00", "2024-01-03 00:00:00")), "bid", "bs", "be")
    def run(bin: Long) = RangeJoin.intervalOverlap(a, "as_", "ae",
        b, "bs", "be", binSeconds = bin)
      .select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(3600) == run(30L * 86400))
    assert(run(3600).distinct == run(3600))
  }

  test("intervalOverlap plans as an equi-join with no dedup shuffle") {
    val a = iv(Seq((1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00")),
      "aid", "as_", "ae")
    val b = iv(Seq((2L, "2024-01-01 12:00:00", "2024-01-03 00:00:00")),
      "bid", "bs", "be")
    val p = RangeJoin.intervalOverlap(a, "as_", "ae", b, "bs", "be")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    // first-shared-bin emission: the plan needs no distinct/dropDuplicates
    assert(!p.toLowerCase.contains("dedup") &&
      "HashAggregate".r.findAllIn(p).isEmpty, s"dedup shuffle in:\n$p")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  // u1 completes A->B->C in order; u2 does B before A (B must not count);
  // u3 stops after A; u4 never does A (nothing counts)
  private def ev = Seq(
    (1L, "A", ts(1)), (1L, "B", ts(2)), (1L, "C", ts(3)),
    (2L, "B", ts(1)), (2L, "A", ts(2)),
    (3L, "A", ts(5)),
    (4L, "B", ts(1)), (4L, "C", ts(2))
  ).toDF("user_id", "event_type", "ts")

  test("funnel truth table: strict ordering, first-touch attribution") {
    val out = Funnel.funnelCounts(ev, Seq("A", "B", "C"))
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // A: u1,u2,u3. B-after-A: only u1 (u2's B precedes its A). C: u1.
    assert(out == Seq((1L, "A", 3L), (2L, "B", 1L), (3L, "C", 1L)), s"$out")
  }

  test("funnel counts are monotone non-increasing") {
    val ns = Funnel.funnelCounts(ev, Seq("A", "B", "C"))
      .orderBy($"step").collect().map(_.getLong(2)).toSeq
    assert(ns == ns.sorted.reverse, s"funnel must narrow: $ns")
  }

  test("a later equal timestamp does NOT qualify (strictly after)") {
    val tie = Seq((7L, "A", ts(1)), (7L, "B", ts(1))).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnelCounts(tie, Seq("A", "B"))
      .orderBy($"step").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(1L, 0L), "ts equality must not advance the funnel")
  }
}

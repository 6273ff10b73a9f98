package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1 -> 2 -> 3 -> 1 cycle plus a dangling sink 4 fed by 1
  private def ring = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    .toDF("src", "dst")

  test("pageRank conserves total mass up to integer-division loss") {
    val scale = 1000000000000L
    val r = Graph.pageRank(ring, iters = 4, scale = scale)
    val total = r.agg(sum($"r")).head.getLong(0)
    // every step floors, so mass only leaks downward — never above scale,
    // and the loss across 4 iterations stays tiny (< 1e-6 of the mass)
    assert(total <= scale, s"mass grew: $total")
    assert(total > scale - 1000000L, s"mass leak too large: $total")
  }

  test("pageRank: symmetric cycle nodes tie; the extra-cited sink differs") {
    val r = Graph.pageRank(ring, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 2 and 3 are structurally identical (each one in-edge from the cycle,
    // each one out-edge)... except 1 splits its rank with the sink 4, so 2
    // receives half of 1's rank while 3 receives all of 2's
    assert(r(3) > r(2), s"3 gets all of 2's mass, 2 only half of 1's: $r")
    assert(r.values.forall(_ > 0), "damped walk reaches every node")
  }

  test("pageRank is deterministic under repartitioning") {
    val a = Graph.pageRank(ring, iters = 3).orderBy($"node").collect().toSeq
    val b = Graph.pageRank(ring.repartition(7), iters = 3)
      .orderBy($"node").collect().toSeq
    assert(a == b, "integer arithmetic must be partitioning-invariant")
  }

  test("pageRank authority: a node cited by everyone outranks the rest") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(star, iters = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(9L) == r.values.max, s"hub must dominate: $r")
  }

  test("pageRank releases superseded round checkpoints (keeps <= 5 RDDs)") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    Graph.pageRank(ring, iters = 6).count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- pre
    // edges + nodes + outdeg + final ranks (+ slack for the in-flight one)
    assert(fresh.size <= 5,
      s"iteration checkpoints must be released as rounds advance: $fresh")
    spark.sparkContext.getPersistentRDDs.filter(kv => fresh(kv._1))
      .values.foreach(_.unpersist(blocking = false))
  }

  test("degrees counts both directions with zero-fill") {
    val d = Graph.degrees(ring).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(d(1L) == ((2L, 1L, 3L)))
    assert(d(4L) == ((0L, 1L, 1L)), "pure sink has zero out-degree")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists (training pipelines meet
  * these as link graphs: page/domain authority for crawl prioritization,
  * citation weighting, near-dup cluster structure).
  *
  * PageRank here is INTEGER-EXACT: ranks are maintained as scaled longs
  * and every per-iteration operation (contribution split, damping,
  * dangling-mass redistribution) is integer arithmetic, so the result is
  * bit-identical regardless of partitioning, summation order, or engine —
  * the DuckDB oracle replays the full iteration unrolled. Floating-point
  * PageRank cannot make that promise (parallel double sums are
  * order-dependent); the deliberate cost is the integer-division mass
  * loss, identical on every engine.
  */
object Graph {

  /** Fixed-iteration damped PageRank over a directed edge list.
    *
    * Semantics per iteration (all integer ops on `scale`-scaled ranks):
    * each node splits `rank div outdeg` to every out-neighbor; nodes with
    * no out-edges are dangling and their pooled mass redistributes
    * uniformly (`dm div n`); every node's next rank is
    * `(scale*(den-num)) div (den*n)  +  (num * (incoming + dm div n)) div den`
    * with damping d = num/den (default 17/20 = 0.85).
    *
    * Scale shape: the edge list is laid out ONCE in a loop-invariant
    * partitioned cache (two regimes — see the layout comment in the
    * body) so an ITERATION MOVES NO EDGE BYTES; each round is the edge
    * scan + groupBy(dst) with map-side combine. The dangling-mass
    * scalar is a 1-row aggregate broadcast back over the nodes, never a
    * driver round-trip inside the plan. Rank checkpoints truncate
    * lineage each round and superseded rounds are released (the
    * bench/guardrail cache-hygiene contract). Measured trade: the
    * layout cache costs ~0.4 s extra at the sf0.1 1x graph (q110
    * 3.5 -> 4.0 s isolated) and wins 3x at the 16x probe (SCALE.md
    * pagerank_3iter 43.7 -> ~12-15 s) — the setup amortizes with edge
    * count, which is the direction that matters.
    *
    * Regime boundary, MEASURED (round-13 SCALE rows pagerank_3iter vs
    * pagerank_3iter_smj): at the 16x probe's 241k nodes the broadcast
    * and sort-merge regimes are a wash (11.96 vs 11.66 s) — the
    * crossover is FLAT well below `broadcastNodeLimit`'s 2M default,
    * so the limit is a memory guard (two node-sized broadcasts per
    * iteration must fit every executor), not a latency cliff; tune it
    * by executor memory, not by timing.
    *
    * Output: (node, r) with r the scaled rank (divide by `scale` for the
    * conventional value). Fixed `iters` rather than convergence detection
    * keeps the oracle replayable; authority ordering stabilizes in a few
    * rounds on shallow graphs.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      srcCol: String = "src",
      dstCol: String = "dst",
      scale: Long = 1000000000000L,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      broadcastNodeLimit: Long = 2000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping must be in (0,1)")
    val sc = edges.sparkSession.sparkContext
    // localCheckpoint registers its blocks as a persistent RDD; capture the
    // fresh ids so superseded rounds can be released precisely (df.rdd is a
    // new wrapper each call — unpersisting it would NOT free the blocks)
    def checkpointWithIds(df: DataFrame): (DataFrame, Set[Int]) = {
      val pre = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- pre).toSet)
    }
    def layout(df: DataFrame, key: String): DataFrame = {
      val out = df.repartition(col(key)).sortWithinPartitions(col(key))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    }
    // dedup + DST layout in ONE materialization (optimistic: the
    // broadcast regime below is the common case, and the node count
    // that decides it can only be read off a materialized edge list
    // anyway — the rare huge-graph path pays one re-layout)
    val eDst = layout(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .dropDuplicates("src", "dst"), "dst")
    val nodes = eDst.select(col("src").as("node"))
      .union(eDst.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    // Two regimes, decided by a cheap node count (checkpointed plans
    // carry no stats, so WITHOUT an explicit hint the node-sized sides
    // never auto-broadcast and every round sort-merge-joins the full
    // edge list — measured as the dominant per-round cost):
    //  - n <= broadcastNodeLimit (rank/outdeg tables broadcastable):
    //    edges cache-partitioned by DST, outdeg and ranks enter as
    //    explicit broadcasts. Broadcast joins preserve the edge
    //    partitioning, so even the groupBy(dst) aggregate needs NO
    //    exchange — and the dangling anti-join and rank-assembly left
    //    join broadcast their node-sized sides too, so a whole
    //    iteration moves nothing but a handful of node-sized
    //    broadcasts: ZERO exchanges per round (round 15: previously the
    //    two bookkeeping joins still sort-merge-joined node-sized
    //    tables, 4 exchanges + 4 sorts per round).
    //  - above the limit (the billion-node regime where broadcasting
    //    ranks is the OOM): edges cache-partitioned AND sorted by SRC,
    //    plain sort-merge joins — each round shuffles only the
    //    node-sized rank/outdeg rows into the fixed edge layout, never
    //    the edges.
    // Loop-invariance needs persist, not localCheckpoint: a checkpoint's
    // LogicalRDD forgets outputPartitioning under AQE (measured: the
    // join re-shuffled the edges every round), while an InMemoryRelation
    // keeps the cached plan's partitioning and ordering. The cache is
    // released before returning (the bench/guardrail hygiene contract).
    val bcast = n <= broadcastNodeLimit
    val e = if (bcast) eDst else {
      val eSrc = layout(eDst, "src")
      eDst.unpersist(blocking = false)
      eSrc
    }
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
      .localCheckpoint(true)
    var (ranks, rankIds) = checkpointWithIds(
      nodes.select(col("node"), lit(scale / n).as("r")))
    val base = (scale * (dampDen - dampNum)) / (dampDen * n)
    (1 to iters).foreach { _ =>
      val od = if (bcast) broadcast(outdeg) else outdeg
      val rk = ranks.select(col("node").as("src"), col("r"))
      val contribs = e
        .join(od, Seq("src"))
        .join(if (bcast) broadcast(rk) else rk, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r div odeg")).as("inc"))
      // broadcast-regime hygiene for the node-sized sides too: the
      // dangling anti-join and the rank-assembly left join otherwise
      // sort-merge two node-sized tables (2 exchanges + 2 sorts EACH,
      // per iteration) — under the regime's own n <= broadcastNodeLimit
      // bound both fit a broadcast, and checkpointed plans carry no
      // stats so the planner never picks it by itself (the same reason
      // od/rk above are explicit). The huge-graph regime keeps the
      // shuffling shapes.
      val dangling = ranks
        .join(if (bcast) broadcast(outdeg.select(col("src").as("node")))
              else outdeg.select(col("src").as("node")),
          Seq("node"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
      val (next, nextIds) = checkpointWithIds(
        nodes
          .crossJoin(broadcast(dangling))
          .join(if (bcast) broadcast(contribs) else contribs,
            Seq("node"), "left")
          .select(col("node"),
            (lit(base) +
              expr(s"($dampNum * (coalesce(inc, 0L) + dm div $n)) div $dampDen"))
              .as("r")))
      // release the superseded round's checkpoint blocks
      rankIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      ranks = next
      rankIds = nextIds
    }
    // the final ranks are materialized (eager checkpoint), so the edge
    // cache can go: nothing downstream replays through it
    e.unpersist(blocking = false)
    ranks
  }

  /** Degree summary of a directed edge list: per node, its out-degree,
    * in-degree, and total. One pass per direction (map-side combined
    * counts) meeting in a full-outer join on the node key — no step is
    * wider than a keyed shuffle. */
  def degrees(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).dropDuplicates("src", "dst")
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        (coalesce(col("out_deg"), lit(0L)) + coalesce(col("in_deg"), lit(0L)))
          .as("degree"))
  }
}

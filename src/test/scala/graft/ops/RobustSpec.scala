package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustSpec extends SparkSpec {
  import spark.implicits._

  // group "a": 1..100 with two planted outliers; group "b": constant
  private def frame = (
    (1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", -1000.0), ("a", 5000.0)) ++
      (1 to 10).map(_ => ("b", 7.0))
  ).toDF("k", "v")

  // width-1.0 bins over the data domain: bound arithmetic is exact
  private def win(df: org.apache.spark.sql.DataFrame) =
    Robust.winsorize(df, "k", "v", 0.05, 0.95,
      binLo = -1000.0, binHi = 5000.0, bins = 6000)
  private def winSummary(df: org.apache.spark.sql.DataFrame) =
    Robust.winsorizeSummary(df, "k", "v", 0.05, 0.95,
      binLo = -1000.0, binHi = 5000.0, bins = 6000)

  test("winsorize clamps every value into the per-group quantile band") {
    val w = win(frame)
    val bad = w.filter($"v" < $"__plo" || $"v" > $"__phi").count()
    assert(bad == 0L)
    // the planted outliers must no longer be present
    val mm = w.filter($"k" === "a").agg(min($"v"), max($"v")).head
    assert(mm.getDouble(0) > -1000.0 && mm.getDouble(1) < 5000.0)
  }

  test("winsorizeSummary counts exactly the rows outside the band") {
    val out = winSummary(frame).collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    // the 5% band edge of 102 values sits above the -1000 outlier and
    // the 95% edge below 5000: at least one clip on each side
    assert(a.getAs[Long]("n") == 102L)
    assert(a.getAs[Long]("n_clip_lo") >= 1L && a.getAs[Long]("n_clip_hi") >= 1L)
    // a group concentrated in ONE bin (a constant column) clips nothing:
    // plo is that bin's lower edge, phi its upper edge
    val b = out("b")
    assert(b.getAs[Long]("n_clip_lo") == 0L && b.getAs[Long]("n_clip_hi") == 0L)
    assert(b.getAs[Double]("win_mean") == 7.0)
  }

  test("winsorized mean is partitioning-invariant (integer-scaled sum)") {
    val one = winSummary(frame).orderBy($"k").collect().toSeq
    val many = winSummary(frame.repartition(13)).orderBy($"k").collect().toSeq
    assert(one == many)
  }

  test("winsorized mean shifts toward the body when outliers clip") {
    val raw = frame.filter($"k" === "a").agg(avg($"v")).head.getDouble(0)
    val win = winSummary(frame)
      .filter($"k" === "a").head.getAs[Double]("win_mean")
    // raw mean is dragged by the +5000/-1000 pair; winsorized sits near
    // the 1..100 body's center
    assert(math.abs(win - 50.5) < math.abs(raw - 50.5))
  }

  test("shuffle regime (broadcastKeyLimit = 0): no broadcast hint, " +
      "identical results") {
    // high-cardinality contract: with the hint off AND auto-broadcast
    // off (so neither Catalyst nor AQE re-derives a broadcast from size
    // stats), the plan must carry NO broadcast join
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fb = Robust.winsorize(frame, "k", "v", 0.05, 0.95,
        binLo = -1000.0, binHi = 5000.0, bins = 6000, broadcastKeyLimit = 0L)
      val p = fb.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"bounds still broadcast in the shuffle regime:\n$p")
      // ...and the results must be bit-identical to the broadcast path
      val hinted = win(frame).orderBy($"k", $"v").collect().toSeq
      assert(fb.orderBy($"k", $"v").collect().toSeq == hinted)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
  }

  test("broadcast tripwire: exceeding the declared key limit fails " +
      "loudly and names the fix, never a silent over-sized broadcast") {
    val e = intercept[Exception] {
      Robust.winsorize(frame, "k", "v", 0.05, 0.95,
        binLo = -1000.0, binHi = 5000.0, bins = 6000,
        broadcastKeyLimit = 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("broadcastKeyLimit")),
      s"tripwire error lost its actionable message: ${messages(e)}")
  }

  test("bounds come from the histogram — no O(group-data) percentile buffer") {
    // the 100x-scale guarantee: aggregation state is O(groups x bins),
    // so the plan must contain no Percentile aggregate anywhere
    val p = winSummary(frame).queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("percentile"),
      s"exact percentile crept back into the plan:\n$p")
  }

  test("the broadcast tripwire is plan-quiet and bounds-only: no " +
      "empty-partition window, no second scan of the facts") {
    val df = Robust.winsorize(frame, "k", "v", 0.05, 0.95,
      binLo = -1000.0, binHi = 5000.0, bins = 100)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // every Window carries a partition spec — the optimizer did not
    // fold the tripwire's runtime-constant key back to the empty spec
    // whose WindowExec WARN fires on every run
    val windows = "windowspecdefinition\\(([^,)]*)"
      .r.findAllMatchIn(finalPlan).map(_.group(1)).toSeq
    assert(windows.nonEmpty && windows.forall(_.trim.nonEmpty),
      s"a no-partition window crept back into the plan:\n$finalPlan")
    // the tripwire sees only the bounds: exactly two scans of the fact
    // relation — the histogram build and the clamp's join left side
    // (a pruned-down count branch would add a third)
    val scans = "LocalTableScan".r.findAllIn(finalPlan).length
    assert(scans == 2,
      s"expected 2 fact scans (histogram + clamp), found $scans:\n$finalPlan")
  }
}

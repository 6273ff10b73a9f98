package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics over an event stream: how many users
  * completed step 1, then step 2 strictly after their first step 1, then
  * step 3 strictly after that, ... — the classic product-analytics
  * sequential count, and the same machinery a data pipeline uses for
  * ordered session milestones.
  *
  * Semantics: a user reaches step i at `t_i = min(ts of step-i events
  * with ts > t_{i-1})` — first-touch attribution, strict ordering. The
  * whole computation is min/count aggregation and equi-joins on the user
  * key: each step filters the event table DOWN first (the type predicate
  * pushes into the scan), shuffles only that step's events on the user
  * key, and joins against the previous frontier (one row per surviving
  * user, so the join's right side shrinks monotonically as the funnel
  * narrows). No window over the full stream, no per-user event-list
  * collection — at 100 TB the per-step filtered shuffle is the only
  * corpus-sized stage and it prunes by event type before moving anything.
  *
  * Each frontier is localCheckpoint'd (one row per user — bounded):
  * step i+1's plan starts from the materialized frontier instead of
  * replaying steps 1..i, and the final per-step counts are a UNION over
  * the checkpointed frontiers — one job, no driver-side loop.
  */
object Funnel {

  /** Per-step funnel: (step, event_type, n_users) — n_users = users whose
    * first qualifying occurrence of this step happened strictly after
    * their qualifying occurrence of the previous step. */
  def funnelCounts(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // frontier after step i: (user, t_i); step 1 is an unconditioned min
    val frontiers = steps.drop(1).scanLeft(
      events.filter(col(typeCol) === steps.head)
        .groupBy(col(userCol).as("u"))
        .agg(min(col(tsCol)).as("t"))
        .localCheckpoint(true)) { (prev, step) =>
      events.filter(col(typeCol) === step)
        .select(col(userCol).as("u"), col(tsCol).as("ts2"))
        .join(prev, Seq("u"))
        .filter(col("ts2") > col("t"))
        .groupBy(col("u"))
        .agg(min(col("ts2")).as("t"))
        .localCheckpoint(true)
    }
    frontiers.zip(steps).zipWithIndex.map { case ((f, s), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("step"), lit(s).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }
}

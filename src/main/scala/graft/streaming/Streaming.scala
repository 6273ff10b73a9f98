package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.8).
  *
  * The reference is strictly batch; these are the streaming analogs its
  * incremental patterns map onto: file-arrival triggered ingestion (the
  * resume ledger becomes checkpointing), watermarked tumbling-window
  * aggregation, and custom sessionization state via mapGroupsWithState.
  * Each transform is defined once and applies to both batch and streaming
  * DataFrames, so correctness is testable in batch and the streaming spec
  * drives the same code through a memory sink.
  */
object Streaming {

  /** File-arrival source: new parquet files under `dir` become
    * micro-batches (S1's streaming analog). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window aggregation over the event stream. */
  def windowedEventCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  case class Event(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      value: Double)
  case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  case class SessionState(lastMicros: Long, nSessions: Long, nEvents: Long)

  /** Stateful per-user sessionization (30-min gap) via mapGroupsWithState
    * — the KeyValueGroupedDataset state-store path. Events inside a batch
    * are sorted before folding so the gap logic is order-correct. */
  def sessionize(events: Dataset[Event],
      gapMicros: Long = 1800L * 1000000L): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // full microsecond precision: getTime truncates to millis
          def micro(e: Event): Long =
            math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          val sorted = it.toSeq.sortBy(e => (micro(e), e.event_id))
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val micros = micro(e)
            val newSession = s.lastMicros == Long.MinValue ||
              micros - s.lastMicros > gapMicros
            s = SessionState(micros,
              s.nSessions + (if (newSession) 1 else 0), s.nEvents + 1)
          }
          state.update(s)
          SessionSummary(userId, s.nSessions, s.nEvents)
      }
  }

  /** Stream-static enrichment join: each micro-batch joins against a
    * static dimension table. The static side is broadcast, so the stream
    * never shuffles — the slowly-updating-dimension re-scan pattern the
    * reference's "rerun 02b after uploads" maps onto. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming exact dedup on a key within the watermark horizon
    * (dropDuplicatesWithinWatermark -> bounded state store; the streaming
    * analog of q30's hash-groupBy dedup). */
  def dedupStream(events: DataFrame, key: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(key)

  case class SessionRow(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Per-user closed sessions via flatMapGroupsWithState: unlike
    * [[sessionize]] (one running summary row per user), this emits ONE
    * ROW PER COMPLETED SESSION — the open tail session stays in state and
    * is flushed by the caller-visible `flushOpen` flag in batch mode.
    * The 0..n output cardinality is exactly what flatMapGroupsWithState
    * exists for (mapGroupsWithState must emit exactly one row). */
  def sessions(events: Dataset[Event], gapMicros: Long = 1800L * 1000000L,
      flushOpen: Boolean = true): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event],
         state: GroupState[(Long, Long, Long)]) =>
          def micro(e: Event): Long =
            math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
          val sorted = it.toSeq.sortBy(e => (micro(e), e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer[SessionRow]()
          // state = (session start, last event, count) of the open session
          var open = state.getOption
          sorted.foreach { e =>
            val us = micro(e)
            open match {
              case Some((s0, last, n)) if us - last <= gapMicros =>
                open = Some((s0, us, n + 1))
              case Some((s0, last, n)) =>
                closed += SessionRow(userId, s0, last, n)
                open = Some((us, us, 1L))
              case None =>
                open = Some((us, us, 1L))
            }
          }
          open.foreach(state.update)
          val tail =
            if (flushOpen) open.map { case (s0, last, n) =>
              SessionRow(userId, s0, last, n)
            }.toSeq
            else Seq.empty
          (closed ++ tail).iterator
      }
  }

  case class UserStats(user_id: Long, n_events: Long, total_value: Double,
      max_value: Double)

  /** Per-user running stats via the transformWithState API (Spark 4's
    * arbitrary-state successor to mapGroupsWithState): typed ValueState
    * survives across micro-batches in the state store (RocksDB provider
    * in streaming mode), and each batch emits the updated summary row.
    * Composable state variables (value/list/map), TTL and timers are the
    * reasons to prefer this API for new stateful operators. */
  class UserStatsProcessor extends StatefulProcessor[Long, Event, UserStats] {
    @transient private var st: ValueState[UserStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStats]("stats",
        Encoders.product[UserStats], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[UserStats] = {
      var s =
        if (st.exists()) st.get()
        else UserStats(key, 0L, 0.0, Double.NegativeInfinity)
      rows.foreach { e =>
        s = UserStats(key, s.n_events + 1, s.total_value + e.value,
          math.max(s.max_value, e.value))
      }
      st.update(s)
      Iterator.single(s)
    }
  }

  /** [[UserStatsProcessor]] applied to a (batch or streaming) event set. */
  def userStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class KeyedId(key: String, id: Long)
  case class DistinctEstimate(key: String, est_distinct: Double)

  /** Streaming HLL: a running distinct-count estimate per key whose state
    * is the CONSTANT-size 64-bucket max-rho table (the mergeable-sketch
    * property doing streaming's work: state never grows with distinct
    * ids, only the sketch updates). Bit-identical to the batch
    * [[graft.ops.Sketches.hllDistinctByKey]] on the same key set — the
    * estimate is a pure function of which ids were ever seen, so batch
    * and streaming agree exactly (spec-pinned), and a re-delivered id is
    * absorbed idempotently (max is idempotent) — replayed micro-batches
    * cannot skew the estimate. */
  class DistinctSketchProcessor
      extends StatefulProcessor[String, KeyedId, DistinctEstimate] {
    @transient private var st: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Long]]("sketch",
        Encoders.kryo[Array[Long]], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[KeyedId],
        tv: TimerValues): Iterator[DistinctEstimate] = {
      val m = if (st.exists()) st.get() else new Array[Long](64)
      rows.foreach { r =>
        val h = graft.ops.Sketches.portableHashLong(r.id)
        val b = graft.ops.Sketches.bucketOf(h)
        val rho = graft.ops.Sketches.rhoOf(h)
        if (rho > m(b)) m(b) = rho
      }
      st.update(m)
      Iterator.single(DistinctEstimate(key, graft.ops.Sketches.estimateOf(m)))
    }
  }

  /** [[DistinctSketchProcessor]] over (key, id) rows — batch or stream. */
  def distinctSketch(pairs: Dataset[KeyedId]): Dataset[DistinctEstimate] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_.key)
      .transformWithState(new DistinctSketchProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class CmsCounter(j: Int, pos: Int, cnt: Long)

  /** Streaming count-min sketch: the running d x width counter table of
    * [[graft.ops.Sketches.cmsTable]], maintained incrementally. The
    * stream keys on the sketch ROW j — the d rows are independent
    * counter arrays, so the state store holds d entries of constant
    * `width` longs each (state never grows with the key universe; the
    * mergeable-counter property does streaming's work) and the d rows
    * update in parallel. Each batch re-emits the counters it touched;
    * a counter's LAST emission is its running value, and after the
    * stream drains the emitted table equals the batch [[cmsTable]] over
    * the same rows exactly (spec-pinned). Unlike the HLL max, counter
    * increments are not idempotent — exactness across retries is the
    * transformWithState checkpoint contract's job, not the sketch's. */
  class CmsSketchProcessor(width: Int)
      extends StatefulProcessor[Int, CmsCounter, CmsCounter] {
    @transient private var st: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Array[Long]]("counters",
        Encoders.kryo[Array[Long]], TTLConfig.NONE)
    override def handleInputRows(key: Int, rows: Iterator[CmsCounter],
        tv: TimerValues): Iterator[CmsCounter] = {
      val c = if (st.exists()) st.get() else new Array[Long](width)
      val touched = scala.collection.mutable.SortedSet.empty[Int]
      rows.foreach { r => c(r.pos) += 1L; touched += r.pos }
      st.update(c)
      touched.iterator.map(p => CmsCounter(key, p, c(p)))
    }
  }

  /** [[CmsSketchProcessor]] over raw long keys — batch or stream. Rows
    * fan out to their d (row, position) coordinates via the scalar twin
    * of the batch derivation, so the streaming table is bit-identical to
    * [[graft.ops.Sketches.cmsTable]]. */
  def cmsSketch(keys: Dataset[Long], depth: Int = 4,
      width: Int = 1024): Dataset[CmsCounter] = {
    import keys.sparkSession.implicits._
    keys
      .flatMap(k => (0 until depth).map(j =>
        CmsCounter(j, graft.ops.Sketches.cmsPosOf(k, j, width), 0L)))
      .groupByKey(_.j)
      .transformWithState(new CmsSketchProcessor(width),
        TimeMode.None(), OutputMode.Update())
  }

  case class SeenKey(key: Long, first_us: Long)

  /** Streaming dedup with EXPLICIT state expiry via event-time timers —
    * the transformWithState analog of [[dedupStream]]. The first sighting
    * of a key emits one row and registers a timer at (event time +
    * horizon); when the watermark passes that instant the timer fires and
    * [[ExpiringDedupProcessor.handleExpiredTimer]] clears the key's
    * state. The state store therefore holds ONLY the keys inside the
    * watermark horizon — never the key universe — which is the property
    * that lets the operator run forever at 100 TB/day: state size is
    * O(arrival rate x horizon), independent of stream length. The
    * bounded-state probe in StreamingSpec drives a multi-horizon stream
    * on RocksDB and goes red if this eviction stops working. */
  class ExpiringDedupProcessor(horizonMs: Long)
      extends StatefulProcessor[Long, Event, SeenKey] {
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SeenKey] = {
      def micro(e: Event): Long =
        math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
      val firstUs = rows.map(micro).min // drains the iterator either way
      if (seen.exists()) Iterator.empty
      else {
        seen.update(firstUs)
        getHandle.registerTimer(firstUs / 1000L + horizonMs)
        Iterator.single(SeenKey(key, firstUs))
      }
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SeenKey] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** [[ExpiringDedupProcessor]] keyed on event_id over a watermarked
    * event stream (event-time mode — timers fire off the watermark). */
  def expiringDedup(events: Dataset[Event],
      horizonMs: Long = 1200000L): Dataset[SeenKey] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_id)
      .transformWithState(new ExpiringDedupProcessor(horizonMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Watermarked stream-stream inner join: each click joins purchases by
    * the same user within the preceding `windowSeconds`. Both sides carry
    * watermarks plus a time-range join condition, so the state store
    * evicts rows once the other side's watermark passes — the bounded-
    * state shape a stream-stream join needs at scale. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: String = "30 minutes",
      windowSeconds: Long = 3600L): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") >= col("click_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
      col("purchase_ts") <= col("click_ts"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("purchase_ts")))
          .as("gap_us"))
  }

  /** Run a streaming DataFrame to completion against bounded input via a
    * memory sink; returns the sink contents. */
  def drainToMemory(spark: SparkSession, streaming: DataFrame,
      name: String, outputMode: OutputMode): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}

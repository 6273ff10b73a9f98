package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Streaming transforms verified against their batch twins over the same
  * bounded input (memory sink + processAllAvailable). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // stage events (with the ns->us conversion applied) into a stream dir
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(d)
    d
  }

  test("windowed aggregation: streaming result equals batch result") {
    val schema = spark.read.parquet(streamDir).schema
    val stream = Streaming.fileStream(spark, streamDir, schema)
    val got = Streaming.drainToMemory(spark,
      Streaming.windowedEventCounts(stream), "win_counts",
      OutputMode.Append())
    // append mode only emits windows below the watermark; compare those
    val batch = Streaming.windowedEventCounts(
      spark.read.parquet(streamDir))
    val gotRows = got.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batchRows = batch.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(gotRows.nonEmpty)
    assert(gotRows.subsetOf(batchRows),
      s"streaming emitted rows not in batch: ${gotRows.diff(batchRows).take(3)}")
  }

  test("stream-static enrichment join matches the batch join") {
    val schema = spark.read.parquet(streamDir).schema
    // static dim: per-user event counts (tiny -> broadcast)
    val dim = Tables.events(spark, sfDir)
      .groupBy($"user_id").agg(count(lit(1)).as("user_total"))
    val stream = Streaming.fileStream(spark, streamDir, schema)
    val got = Streaming.drainToMemory(spark,
      Streaming.enrichWithStatic(stream.select($"event_id", $"user_id"), dim,
        "user_id"),
      "enriched", OutputMode.Append())
    val batch = Tables.events(spark, sfDir).select($"event_id", $"user_id")
      .join(dim, Seq("user_id"), "left")
    assert(got.count() == batch.count())
    val g = got.collect().map(r =>
      (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    val b = batch.collect().map(r =>
      (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    assert(g == b)
  }

  test("streaming dedup within watermark drops planted duplicates") {
    // plant exact duplicates: write the same events twice into the dir
    val d = Files.createTempDirectory("events_dup_stream").toString
    val ev = Tables.events(spark, sfDir).select($"event_id", $"ts")
    ev.write.mode("append").parquet(d)
    ev.write.mode("append").parquet(d)
    val schema = spark.read.parquet(d).schema
    val stream = Streaming.fileStream(spark, d, schema)
    val got = Streaming.drainToMemory(spark,
      Streaming.dedupStream(stream, "event_id"), "deduped",
      OutputMode.Append())
    val distinct = ev.select($"event_id").distinct().count()
    assert(spark.read.parquet(d).count() == 2 * distinct)
    assert(got.count() == distinct,
      s"dedup kept ${got.count()} of ${2 * distinct}, expected $distinct")
  }

  test("stream-stream join matches the batch time-range join") {
    val schema = spark.read.parquet(streamDir).schema
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter($"event_type" === "click"),
      df.filter($"event_type" === "purchase"))
    val (sc, sp) = sides(Streaming.fileStream(spark, streamDir, schema))
    val got = Streaming.drainToMemory(spark,
      Streaming.clickPurchaseJoin(sc, sp), "ss_join", OutputMode.Append())
    val (bc, bp) = sides(Tables.events(spark, sfDir))
    val batch = Streaming.clickPurchaseJoin(bc, bp)
    val g = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = batch.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(g.nonEmpty, "stream-stream join emitted nothing")
    assert(g == b, s"missing=${(b -- g).take(3)} extra=${(g -- b).take(3)}")
  }

  test("foreachBatch parquet sink is idempotent under batch replay") {
    // the production sink pattern: write each micro-batch to a
    // batchId-named directory, skipping ids already present — replaying
    // a batch after a crash cannot duplicate data
    val schema = spark.read.parquet(streamDir).schema
    val out = Files.createTempDirectory("fb_sink").toString
    def writeBatch(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val dir = java.nio.file.Paths.get(out, s"batch=$id")
      if (!java.nio.file.Files.exists(dir))
        df.write.parquet(dir.toString)
    }
    val stream = Streaming.fileStream(spark, streamDir, schema)
      .select($"event_id", $"user_id")
    val q = stream.writeStream.foreachBatch(writeBatch _)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(s"$out/batch=*")
    val expect = Tables.events(spark, sfDir).count()
    assert(written.count() == expect)
    // replaying batch 0 must be a no-op (directory already exists)
    val b0 = spark.read.parquet(s"$out/batch=0")
    writeBatch(b0, 0L)
    assert(spark.read.parquet(s"$out/batch=*").count() == expect,
      "batch replay duplicated rows")
  }

  test("transformWithState running stats equal the batch aggregate") {
    // streaming mode needs the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(streamDir).schema
      val stream = Streaming.fileStream(spark, streamDir, schema)
        .select($"user_id", $"event_id", $"ts", $"value")
        .as[Streaming.Event]
      val got = Streaming.drainToMemory(spark,
        Streaming.userStats(stream).toDF(), "tws_stats", OutputMode.Update())
      // update mode re-emits per batch; the final row per user is the total
      val last = got.collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(_._1)
        // n_events grows monotonically: max = final state
        .map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
      val batch = Tables.events(spark, sfDir)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("tot"),
          max($"value").as("mx"))
        .collect().map(r =>
          r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(last.keySet == batch.keySet)
      last.foreach { case (u, (n, tot, mx)) =>
        val (bn, btot, bmx) = batch(u)
        assert(n == bn, s"user $u count $n != $bn")
        assert(math.abs(tot - btot) < 1e-6, s"user $u total $tot != $btot")
        assert(mx == bmx, s"user $u max $mx != $bmx")
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming HLL sketch equals the batch per-key estimate exactly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(streamDir).schema
      val stream = Streaming.fileStream(spark, streamDir, schema)
        .select($"event_type".as("key"), $"user_id".as("id"))
        .as[Streaming.KeyedId]
      val got = Streaming.drainToMemory(spark,
        Streaming.distinctSketch(stream).toDF(), "tws_hll", OutputMode.Update())
      // update mode re-emits per batch; keep each key's LAST estimate.
      // The estimate is not monotone (a new max-rho can lower the
      // harmonic mean), so "last emitted" is the converged sketch — at
      // one input file there is exactly one batch per key anyway.
      val last = got.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = graft.ops.Sketches.hllDistinctByKey(
          Tables.events(spark, sfDir), "user_id", "event_type")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(last == batch,
        s"streaming sketch must equal batch exactly: $last vs $batch")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming CMS counters equal the batch table exactly") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(streamDir).schema
      val stream = Streaming.fileStream(spark, streamDir, schema)
        .select($"user_id").as[Long]
      val got = Streaming.drainToMemory(spark,
        Streaming.cmsSketch(stream, depth = 4, width = 256).toDF(),
        "tws_cms", OutputMode.Update())
      // update mode re-emits touched counters per batch; a counter's
      // LAST emission is its running value (counters only grow)
      val last = got.collect()
        .map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
      val batch = graft.ops.Sketches.cmsTable(
          Tables.events(spark, sfDir).select($"user_id".as("k")), "k",
          depth = 4, width = 256)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(last == batch,
        s"streaming CMS must equal the batch table: ${last.size} vs ${batch.size} counters")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("scalar portable hash is the bit-exact twin of the Column version") {
    val ks = Seq(0L, 1L, 42L, 999999L, 1000000007L, Long.MaxValue, -17L)
    val viaCol = ks.toDF("k")
      .select(graft.ops.Sketches.portableHash($"k").as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == ks.map(graft.ops.Sketches.portableHashLong))
  }

  test("watermark eviction keeps dedup state bounded over a long stream") {
    // The scale property specs can't see from one micro-batch: over a
    // stream spanning many watermark horizons, the dedup state store must
    // hold only the keys inside the horizon — NOT the whole key universe
    // — while still emitting every unique key exactly once. 24 single-file
    // micro-batches, each one hour of event time later, 50 fresh keys per
    // batch, 20-minute watermark: keys expire two batches after arrival,
    // so bounded state proves eviction actually runs.
    val d = Files.createTempDirectory("long_dedup_stream").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val nBatches = 24; val keysPerBatch = 50
    val t0 = System.currentTimeMillis()
    (0 until nBatches).foreach { b =>
      val rows = (0 until keysPerBatch).map { i =>
        (b.toLong * keysPerBatch + i,
          new java.sql.Timestamp(base + b * 3600000L + i * 1000L))
      }
      val tmp = Files.createTempDirectory(s"batch_$b")
      rows.toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.walk(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val target = java.nio.file.Paths.get(d, f"b$b%03d.parquet")
      java.nio.file.Files.move(part, target)
      // deterministic arrival order: the file source triggers batches in
      // modification-time order
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(t0 + b * 1000L))
    }
    val schema = spark.read.parquet(d).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val q = Streaming.dedupStream(stream, "event_id", watermark = "20 minutes")
      .writeStream.format("memory").queryName("long_dedup")
      .outputMode(OutputMode.Append()).start()
    val stateRows =
      try { q.processAllAvailable();
        q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal)) }
      finally q.stop()
    // completeness: every unique key emitted exactly once
    assert(spark.table("long_dedup").count() == nBatches.toLong * keysPerBatch)
    // boundedness: state never holds more than ~2 horizons of keys...
    assert(stateRows.nonEmpty)
    assert(stateRows.max <= 3L * keysPerBatch,
      s"state grew to ${stateRows.max} rows — watermark eviction not running")
    // ...and never approaches the key universe (the unbounded-state smell)
    assert(stateRows.max < nBatches.toLong * keysPerBatch / 4)
  }

  test("transformWithState timer eviction keeps state bounded on RocksDB") {
    // The round-open scale property: a transformWithState operator over a
    // stream spanning many watermark horizons must hold only the keys
    // inside the horizon in its RocksDB state store — clearing state is
    // the PROCESSOR's job (event-time timers), not dropDuplicates
    // machinery, so this spec goes red if handleExpiredTimer stops
    // clearing. 24 single-file micro-batches, each one hour of event time
    // later, 50 fresh keys per batch, 5-minute watermark, 20-minute timer
    // horizon: a key's timer fires at most two batches after arrival.
    val d = Files.createTempDirectory("tws_evict_stream").toString
    val base = java.sql.Timestamp.valueOf("2026-02-01 00:00:00").getTime
    val nBatches = 24; val keysPerBatch = 50
    val t0 = System.currentTimeMillis()
    (0 until nBatches).foreach { b =>
      val rows = (0 until keysPerBatch).map { i =>
        (0L, b.toLong * keysPerBatch + i,
          new java.sql.Timestamp(base + b * 3600000L + i * 1000L), 0.0)
      }
      val tmp = Files.createTempDirectory(s"tws_batch_$b")
      rows.toDF("user_id", "event_id", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.walk(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val target = java.nio.file.Paths.get(d, f"b$b%03d.parquet")
      java.nio.file.Files.move(part, target)
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(t0 + b * 1000L))
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(d).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(d)
        .withWatermark("ts", "5 minutes")
        .as[Streaming.Event]
      val q = Streaming.expiringDedup(stream, horizonMs = 1200000L)
        .writeStream.format("memory").queryName("tws_evict")
        .outputMode(OutputMode.Append()).start()
      val stateRows =
        try { q.processAllAvailable();
          q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal)) }
        finally q.stop()
      // completeness: every unique key emitted exactly once
      assert(spark.table("tws_evict").count() ==
        nBatches.toLong * keysPerBatch)
      // the metric must be LIVE (a 0-reporting operator would pass any
      // bound vacuously): at some point state holds at least one batch
      assert(stateRows.nonEmpty && stateRows.max >= keysPerBatch,
        s"numRowsTotal never reached $keysPerBatch: ${stateRows.toSeq}")
      // boundedness: state plateaus at ~the horizon's key count...
      assert(stateRows.max <= 3L * keysPerBatch,
        s"state grew to ${stateRows.max} rows — timer eviction not running")
      // ...and never approaches the key universe
      assert(stateRows.max < nBatches.toLong * keysPerBatch / 4)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("flatMapGroupsWithState sessions agree with the q24 session counts") {
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[Streaming.Event]
    val rows = Streaming.sessions(events).collect()
    // one row per session: per-user counts must match the oracle query
    val perUser = rows.groupBy(_.user_id)
      .map { case (u, ss) => u -> (ss.length.toLong, ss.map(_.n_events).sum) }
    val batch = graft.SparkEntry.queries("q24_sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perUser == batch)
    // sessions are internally consistent: ordered, gap-split, non-empty
    rows.groupBy(_.user_id).values.foreach { ss =>
      val sorted = ss.sortBy(_.start_us).toList
      sorted.foreach { s =>
        assert(s.start_us <= s.end_us && s.n_events > 0)
      }
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.start_us - a.end_us > 1800L * 1000000L,
            s"sessions should have been merged: $a | $b")
        case _ =>
      }
    }
  }

  test("stateful sessionization matches the batch q24 oracle query") {
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[Streaming.Event]
    val sessions = Streaming.sessionize(events).collect()
      .map(s => s.user_id -> (s.n_sessions, s.n_events)).toMap
    val batch = graft.SparkEntry.queries("q24_sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(sessions == batch)
  }
}

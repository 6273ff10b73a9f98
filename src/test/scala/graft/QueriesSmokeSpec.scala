package graft

/** Every registered query runs end-to-end at sf0.001 and the driver
  * contract invariants hold — including the cache-leak guardrail: a query
  * may leave behind only the localCheckpoint blocks backing its own
  * bounded result; a plain persist() that escapes an operator (the
  * round-3 cosinePairs bug class) turns the query's test red instead of
  * silently taxing every later job in the session. */
class QueriesSmokeSpec extends SparkSpec {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a query") {
    spark // oracle generation resolves SparkSession.active — create it
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001, returns rows, leaks no caches") {
      val pre = spark.sparkContext.getPersistentRDDs.keySet
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // q06 (customers with no orders) may legitimately be empty at tiny SF;
      // everything else must produce rows for the driver's smoke gate.
      if (q.name != "q06_anti_join_not_exists") assert(n > 0, s"${q.name} empty")
      // Guardrail: whatever the query left registered must be ONLY the
      // localCheckpoint blocks backing its bounded result. A surviving
      // plain persist() is a leak — the operator was required to release
      // its corpus-sized intermediates before returning.
      val fresh = spark.sparkContext.getPersistentRDDs -- pre
      val escapees = fresh.filter(kv =>
        !org.apache.spark.rdd.GraftRddTestBridge.isLocallyCheckpointed(kv._2))
      assert(escapees.isEmpty,
        s"${q.name} leaked non-checkpoint persists: RDDs ${escapees.keys.toSeq.sorted}")
      assert(fresh.size <= 8,
        s"${q.name} left ${fresh.size} checkpoint RDDs — results must stay bounded")
      // release the result blocks so accumulation never taxes later tests
      // (same hygiene the bench harness applies between timed queries)
      fresh.values.foreach(_.unpersist(blocking = false))
    }
  }

  test("guardrail control: a deliberate persist leak is detected") {
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    val leaked = Tables.customer(spark, sfDir).persist()
    try {
      leaked.count()
      val fresh = spark.sparkContext.getPersistentRDDs -- pre
      // this is exactly the condition the per-query guard asserts empty
      assert(fresh.exists(kv =>
        !org.apache.spark.rdd.GraftRddTestBridge.isLocallyCheckpointed(kv._2)),
        "detector failed to flag a plain persist()")
    } finally leaked.unpersist(blocking = true)
  }
}

package graft

/** Every registered query runs end-to-end at sf0.001 and the driver
  * contract invariants hold. */
class QueriesSmokeSpec extends SparkSpec {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // q06 (customers with no orders) may legitimately be empty at tiny SF;
      // everything else must produce rows for the driver's smoke gate.
      if (q.name != "q06_anti_join_not_exists") assert(n > 0, s"${q.name} empty")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Columnar/text format interop (SURVEY §2.1 source/sink coverage
  * beyond parquet/CSV/JSON-docs): ORC round-trips with predicate
  * pushdown intact, and JSON-lines round-trips through schema
  * inference. DuckDB reads neither, so these are spec-verified against
  * the parquet source of truth. */
class FormatsSpec extends SparkSpec {

  private lazy val src = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
      "l_shipdate")

  test("ORC round-trip preserves rows; filters push into the ORC scan") {
    val dir = Files.createTempDirectory("li_orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == src.count())
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))
    assert(back.collect().map(key).toSet == src.collect().map(key).toSet)
    val q = back.filter(col("l_quantity") > 45.0).select("l_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no ORC pushdown in:\n$plan")
    assert(q.count() ==
      src.filter(col("l_quantity") > 45.0).count())
  }

  test("JSON-lines round-trip through schema inference") {
    val dir = Files.createTempDirectory("li_json").toString
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == src.count())
    // inference types: long/long/double/string + shipdate as string
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(col("l_quantity").cast("double")),
        countDistinct(col("l_returnflag"))).head()
    assert(agg(back.withColumnRenamed("l_shipdate", "ignored")) ==
      agg(src.withColumnRenamed("l_shipdate", "ignored")))
  }
}

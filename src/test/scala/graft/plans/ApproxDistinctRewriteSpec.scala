package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite()
    spark.conf.set("spark.graft.approxDistinct", "true")
    try f finally {
      spark.conf.unset("spark.graft.approxDistinct")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[ApproxDistinctRewrite])
    }
  }

  private def keys = (1L to 10000L).map(k => (k, (k % 4).toString))
    .toDF("k", "g")

  test("flag off: plans and answers stay exact") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ ApproxDistinctRewrite()
    try {
      val df = keys.agg(count_distinct($"k").as("n"))
      assert(df.head.getLong(0) == 10000L, "must remain exact without the flag")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[ApproxDistinctRewrite])
  }

  test("flag on: count(distinct) becomes the sketch plan, answer approximate") {
    withRule {
      val df = keys.agg(count_distinct($"k").as("n"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("count(distinct"),
        s"distinct aggregate must be rewritten:\n$opt")
      assert(opt.contains("__bucket"), s"sketch stages missing:\n$opt")
      val est = df.head.getLong(0)
      assert(est != 10000L && math.abs(est - 10000L) < 4000L,
        s"estimate $est must be approximate but in the error envelope")
      // bit-exact agreement with the library's column-level sketch
      val expect = graft.ops.Sketches.hllDistinct(keys, "k").head.getDouble(0)
      assert(math.abs(est - expect) <= 1L,
        s"rule plan must equal Sketches.hllDistinct: $est vs $expect")
    }
  }

  test("flag on: grouped count(distinct) keeps grouping semantics") {
    withRule {
      val got = keys.groupBy($"g").agg(count_distinct($"k").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = graft.ops.Sketches.hllDistinctByKey(keys, "k", "g")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet)
      got.foreach { case (g, n) =>
        assert(math.abs(n - expect(g)) <= 1L, s"group $g: $n vs ${expect(g)}")
      }
    }
  }

  test("SQL path rewrites too; ineligible shapes bail to exact") {
    withRule {
      keys.createOrReplaceTempView("adr_keys")
      val est = spark.sql("SELECT count(DISTINCT k) AS n FROM adr_keys")
        .head.getLong(0)
      assert(est != 10000L, "SQL count(DISTINCT) must route through the sketch")
      // two aggregates in one list -> conservative bail, stays exact
      val multi = spark.sql(
        "SELECT count(DISTINCT k) AS n, max(k) AS mx FROM adr_keys").head
      assert(multi.getLong(0) == 10000L && multi.getLong(1) == 10000L,
        "mixed aggregate lists must remain exact")
      // non-integral key -> bail
      val str = spark.sql("SELECT count(DISTINCT g) AS n FROM adr_keys")
        .head.getLong(0)
      assert(str == 4L, "string keys must remain exact")
    }
  }
}

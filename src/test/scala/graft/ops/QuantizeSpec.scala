package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips within one scale step and saturates at ±127") {
    val df = Seq((0L, Array(1.0f, -0.5f, 0.25f, -1.0f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.quantizationReport(df).head()
    val scale = r.getAs[Double]("scale")
    // report rounds scale to 9 dp
    assert(math.abs(scale - 1.0 / 127.0) < 5e-10)
    // 1.0 -> 127, -0.5 -> -64 (round(63.5) away from zero), 0.25 -> 32,
    // -1.0 -> -127
    assert(r.getAs[Long]("qsum") == 127L - 64L + 32L - 127L)
    assert(r.getAs[Int]("n_saturated") == 2)
    assert(r.getAs[Double]("max_err") <= scale / 2 + 1e-9)
  }

  test("zero vector quantizes to zeros with scale 0, no NaN") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.quantizationReport(df).head()
    assert(r.getAs[Double]("scale") == 0.0)
    assert(r.getAs[Long]("qsum") == 0L)
    assert(r.getAs[Double]("max_err") == 0.0)
  }

  test("report stays whole-stage-codegen map work: no exchange in plan") {
    val df = Seq((0L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val plan = Quantize.quantizationReport(df)
      .queryExecution.executedPlan.toString
    // single global sort for the orderBy is fine; no aggregate exchange
    assert(!plan.contains("HashAggregate"))
  }
}

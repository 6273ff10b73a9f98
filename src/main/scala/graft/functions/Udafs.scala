package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregators (SURVEY §2.9): the `Aggregator` API is the
  * scale-correct way to add an aggregate Spark lacks — it participates
  * in two-phase aggregation (partial `reduce` map-side, `merge` after
  * the shuffle), unlike a collect-and-fold or a window trick, so the
  * shuffle carries one small buffer per group per partition, not rows. */
object Udafs {

  case class GeoBuf(sumLog: Double, n: Long)

  /** Geometric mean over positive values: exp(mean(ln x)). The buffer is
    * (sum of logs, count) — associative + commutative, so partial
    * aggregation applies; non-positive values are ignored (count only
    * what ln is defined for). */
  object GeometricMean extends Aggregator[Double, GeoBuf, Double] {
    def zero: GeoBuf = GeoBuf(0.0, 0L)
    def reduce(b: GeoBuf, x: Double): GeoBuf =
      if (x > 0.0) GeoBuf(b.sumLog + math.log(x), b.n + 1) else b
    def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.sumLog + b.sumLog, a.n + b.n)
    def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
    def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[GeometricMean]] as an untyped column aggregate for DataFrame use. */
  def geoMean(c: Column): Column = udaf(GeometricMean).apply(c)
}

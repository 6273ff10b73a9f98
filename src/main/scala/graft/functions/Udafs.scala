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

  case class Scored(score: Double, id: Long)
  case class TopKBuf(items: Seq[Scored])

  /** Bounded top-k aggregator: the buffer never holds more than k
    * (score, id) pairs, ordered by the (score, id) comparator. Because it
    * is a real Aggregator, the k-item pruning happens MAP-SIDE in the
    * partial phase — each partition contributes at most k candidates to
    * the shuffle, where the window row_number formulation must shuffle
    * and sort every row of every group. The comparator includes the id,
    * so ties are deterministic. */
  class TopK(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score < b.score || (a.score == b.score && a.id < b.id)
    private def prune(xs: Seq[Scored]): Seq[Scored] =
      xs.sortWith((a, b) => lt(b, a)).take(k)
    def zero: TopKBuf = TopKBuf(Nil)
    def reduce(b: TopKBuf, x: Scored): TopKBuf =
      if (b.items.size < k || lt(b.items.last, x))
        TopKBuf(prune(b.items :+ x))
      else b
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(prune(a.items ++ b.items))
    def finish(b: TopKBuf): Seq[Scored] = b.items
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** [[TopK]] as a column aggregate; returns array<struct<score,id>>.
    * `udaf` flattens a case-class input encoder into one parameter per
    * field, so the aggregate takes the two columns separately — passing
    * one struct(score, id) column fails analysis with
    * DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE. */
  def topK(k: Int, score: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.product[Scored]).apply(score, id)

  /** [[TopK]]'s ascending twin: the k SMALLEST (score, id) pairs in
    * (score asc, id asc) order — the nearest-neighbor shape, where the
    * score is a distance and ties at the boundary go to the LOWER id
    * (the queryTopK sort contract). Same bounded-buffer property: each
    * partition contributes at most k pairs per group to the shuffle. */
  class BottomK(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score < b.score || (a.score == b.score && a.id < b.id)
    private def prune(xs: Seq[Scored]): Seq[Scored] =
      xs.sortWith(lt).take(k)
    def zero: TopKBuf = TopKBuf(Nil)
    def reduce(b: TopKBuf, x: Scored): TopKBuf =
      if (b.items.size < k || lt(x, b.items.last))
        TopKBuf(prune(b.items :+ x))
      else b
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf(prune(a.items ++ b.items))
    def finish(b: TopKBuf): Seq[Scored] = b.items
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** [[BottomK]] as a column aggregate; returns array<struct<score,id>>
    * sorted ascending. */
  def bottomK(k: Int, score: Column, id: Column): Column =
    udaf(new BottomK(k), Encoders.product[Scored]).apply(score, id)

  case class HllIn(v: Long, valid: Boolean)
  case class HllBuf(maxRho: Seq[Long])

  /** The engine-portable HLL cardinality sketch
    * ([[graft.ops.Sketches]]) as a typed Aggregator: the buffer is the
    * 64-entry max-rho table itself, `reduce` folds one hashed key in
    * map-side, `merge` is the element-wise max (the mergeable-sketch
    * property as an Aggregator merge), and `finish` is the same
    * integer-scaled harmonic estimate the q112 oracle replays — so N
    * of these in ONE `df.agg(...)` profile N columns' distinct counts
    * in a single pass with a constant 64-long buffer each, where N
    * exact `count_distinct`s plan an Expand (rows x columns) and
    * shuffle every column's full distinct universe. Null inputs
    * arrive as (0, valid=false) and are skipped, matching
    * count_distinct's null semantics. */
  object HllSketch extends Aggregator[HllIn, HllBuf, Double] {
    private val M = 64
    def zero: HllBuf = HllBuf(Vector.fill(M)(0L))
    def reduce(b: HllBuf, x: HllIn): HllBuf =
      if (!x.valid) b
      else {
        val h = graft.ops.Sketches.portableHashLong(x.v)
        val bucket = graft.ops.Sketches.bucketOf(h)
        val rho = graft.ops.Sketches.rhoOf(h)
        if (rho > b.maxRho(bucket)) HllBuf(b.maxRho.updated(bucket, rho))
        else b
      }
    def merge(a: HllBuf, b: HllBuf): HllBuf =
      HllBuf(a.maxRho.lazyZip(b.maxRho).map(math.max))
    // an all-zero table means NOTHING was folded (any value sets some
    // bucket's rho >= 1): report 0 like count_distinct, not the raw
    // estimator's empty-sketch bias (alpha*m ~ 45.4). The SQL replay is
    // never exercised on an empty column (its aggregate would be NULL).
    def finish(b: HllBuf): Double =
      if (b.maxRho.forall(_ == 0L)) 0.0
      else graft.ops.Sketches.estimateOf(b.maxRho.toArray)
    def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[HllSketch]] over a numeric column: the key is the value's
    * TRUNCATING long cast (Spark `cast` semantics; the oracle replays
    * `trunc`), so fractional columns should be pre-scaled to integer
    * units by the caller — the [[graft.ops.Sketches]] contract. */
  def hllEst(value: Column): Column =
    udaf(HllSketch, Encoders.product[HllIn])
      .apply(org.apache.spark.sql.functions.coalesce(
        value.cast("long"), org.apache.spark.sql.functions.lit(0L)),
        value.isNotNull)
}

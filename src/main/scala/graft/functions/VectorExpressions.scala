package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Single-pass JVM kernels for the embedding-similarity surface
  * (graft.ops.Similarity). The Column-HOF formulations
  * (`aggregate(zip_with(...))` dot products) are semantically identical but
  * allocate an intermediate array per pair per row and re-run the fold for
  * every consuming expression; these kernels walk the two float arrays once
  * with primitive locals. Summation order is the same left-to-right fold,
  * so results are bit-identical to the HOF twins (pinned in
  * SimilaritySpec) and to the DuckDB oracle's `list_sum` replay.
  */
object VectorKernels {

  /** Cosine similarity of two float vectors; accumulates in double,
    * left-to-right, exactly like the aggregate-fold twin. Extra elements
    * beyond the shorter input are ignored (zip_with semantics never arise
    * here: inputs share a fixed dim). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Engine-portable plane weight — the same pure-integer formula as
    * graft.ops.Similarity.planeWeight, duplicated here so the kernel layer
    * has no dependency on the ops layer. */
  def planeWeight(k: Int): Double =
    (((k + 1L) * 2654435761L % 1000000007L) % 2001L - 1000L) / 1000.0

  /** Flattened (numPlanes x dim) portable hyperplane table. */
  def planeTable(numPlanes: Int, dim: Int): Array[Double] =
    Array.tabulate(numPlanes * dim)(planeWeight)

  /** PQ encode + ADC lookup fused into one pass: for each of the m
    * subspaces, find the codebook centroid nearest (squared L2) to the
    * vector's subslice — ties to the LOWEST code, i.e. the FIRST index
    * attaining the minimum, exactly `array_position(dists,
    * array_min(dists)) - 1` — and accumulate the ADC table entry for
    * that (cell, subspace, code), left-to-right over subspaces. Distance
    * accumulation per centroid is the same i-ascending `(x - c)^2` fold
    * as the HOF twin (graft.ops.Pq.encode), so the result is
    * bit-identical to encode-then-lookup (pinned in PqSpec); the HOF
    * twin allocated an m*k-expression tree that evaluated interpreted,
    * per row. */
  def pqAdcScore(
      v: ArrayData,
      cell: Int,
      codebooks: Array[Array[Array[Double]]],
      adc: Array[Array[Array[Double]]]): Double = {
    val m = codebooks.length
    val sub = if (m == 0) 0 else codebooks(0)(0).length
    val adcCell = adc(cell)
    var acc = 0.0
    var j = 0
    while (j < m) {
      val book = codebooks(j)
      val base = j * sub
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = v.getFloat(base + i).toDouble - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      acc += adcCell(j)(bestC)
      j += 1
    }
    acc
  }

  /** All band buckets of the hyperplane LSH signature in one pass:
    * bit(p) = (dot(v, plane_p) > 0), bucket(b) = the binary fold of the
    * band's `numPlanes/bands` bits (matches `aggregate(slice(bits,...),
    * 0, a*2+v)` in the HOF twin). One kernel call replaces numPlanes HOF
    * dot products + bands fold expressions. */
  def lshBandBuckets(
      v: ArrayData,
      weights: Array[Double],
      numPlanes: Int,
      bands: Int,
      dim: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val r = numPlanes / bands
    val buckets = new Array[Long](bands)
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      val base = p * dim
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * weights(base + i)
        i += 1
      }
      val bit = if (dot > 0) 1L else 0L
      val b = p / r
      buckets(b) = buckets(b) * 2L + bit
      p += 1
    }
    new GenericArrayData(buckets)
  }
}

private object VectorExprTypes {
  def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Cosine similarity of two array<float> columns (codegen'd static call). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "cosine_sim"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprTypes.isFloatArray(left.dataType) &&
        VectorExprTypes.isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<bigint> of the `bands` LSH band buckets of an array<float>
  * embedding (codegen'd static call; the plane table lives in a
  * generated-class field, not inline code). */
case class LshBandBucketsExpr(
    child: Expression, numPlanes: Int, bands: Int, dim: Int)
    extends UnaryExpression {
  require(numPlanes % bands == 0, "numPlanes must be divisible by bands")
  override def prettyName: String = "lsh_band_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprTypes.isFloatArray(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${child.dataType.simpleString}")
  @transient private lazy val weights = VectorKernels.planeTable(numPlanes, dim)
  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBandBuckets(
      input.asInstanceOf[ArrayData], weights, numPlanes, bands, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("planeTable", weights, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshBandBuckets($c, $w, $numPlanes, $bands, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused PQ encode + ADC scoring of an array<float> embedding against
  * baked-in codebooks and per-cell ADC tables (codegen'd static call;
  * both tables live in generated-class fields). `cell` selects the ADC
  * table — pass a literal 0 with a single table for non-IVF PQ. */
case class PqAdcScoreExpr(
    left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]],
    adc: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def prettyName: String = "pq_adc_score"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprTypes.isFloatArray(left.dataType) &&
        right.dataType == org.apache.spark.sql.types.IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(v: Any, cell: Any): Any =
    VectorKernels.pqAdcScore(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], codebooks, adc)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val ad = ctx.addReferenceObj("pqAdc", adc, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VectorKernels.pqAdcScore($v, $c, $cb, $ad)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column wrappers for the native expressions. */
  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def lshBandBuckets(v: Column, numPlanes: Int, bands: Int, dim: Int): Column =
    GraftColumnBridge.column(LshBandBucketsExpr(
      GraftColumnBridge.expression(v), numPlanes, bands, dim))
  def pqAdcScore(v: Column, cell: Column,
      codebooks: Array[Array[Array[Double]]],
      adc: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqAdcScoreExpr(
      GraftColumnBridge.expression(v), GraftColumnBridge.expression(cell),
      codebooks, adc))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the inverse Albers transform (SURVEY
  * §7.3: the one F10 candidate worth promoting from UDF to Expression).
  *
  * Unlike a Scala UDF these stay inside WholeStageCodegen: doGenCode
  * emits a direct static call (Scala objects expose static forwarders),
  * so no SerDe boundary, no boxing, null-safety handled by the standard
  * BinaryExpression scaffolding. Out-of-domain points yield NaN (the
  * expression-level analog of Geo.inverse's None).
  */
abstract class AlbersBase extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
}

/** Longitude (degrees, wrapped to [-180,180]) of an EPSG:5070 point. */
case class AlbersLon(left: Expression, right: Expression) extends AlbersBase {
  override def prettyName: String = "albers_lon"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.wri.Geo.inverseLonJava(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.wri.Geo.inverseLonJava($x, $y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Latitude (degrees) of an EPSG:5070 point. */
case class AlbersLat(left: Expression, right: Expression) extends AlbersBase {
  override def prettyName: String = "albers_lat"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.wri.Geo.inverseLatJava(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.wri.Geo.inverseLatJava($x, $y)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register the native functions for SQL / expr() use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("albers_lon",
      exprs => AlbersLon(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("albers_lat",
      exprs => AlbersLat(exprs(0), exprs(1)), "built-in")
    TextNormFunctions.register(spark)
  }
}

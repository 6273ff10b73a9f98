package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Opt-in approximate query processing: when
  * `spark.graft.approxDistinct=true`, rewrite
  * `count(DISTINCT <integral col>)` aggregates into the engine-portable
  * HLL sketch plan (the `APPROX_COUNT_DISTINCT` switch of warehouse
  * engines, done as a Catalyst optimizer rule instead of a function the
  * user must rewrite queries around).
  *
  * Why a `Rule[LogicalPlan]`: the exact plan shuffles every distinct key
  * (Expand + two-phase distinct aggregate — the key universe travels);
  * the sketch plan shuffles AT MOST m=64 rows per partition per group.
  * At 100 TB that is the difference between a terabyte-scale exchange
  * and a kilobyte-scale one, and it is a PLAN property, so the right
  * place to apply it is the optimizer, gated on an explicit session
  * flag because the answer becomes approximate (±13% std error at m=64).
  *
  * Scope guards (bail = leave the plan exact): the aggregate list must
  * be exactly the grouping columns plus ONE `count(distinct k)` with an
  * integral k and no FILTER clause, and grouping keys must be attributes
  * — the conservative subset where the rewrite is provably shape-
  * preserving (same schema, same exprIds, LongType result).
  *
  * The generated plan is [[graft.ops.Sketches.hllDistinctByKey]]'s exact
  * arithmetic (same portable avalanche hash, same integer-scaled
  * harmonic sum), so its estimates are bit-identical to the library's
  * column-level sketch and replayable by the same oracle SQL.
  */
case class ApproxDistinctRewrite() extends Rule[LogicalPlan] {

  private val P = Literal(1000000007L, LongType)
  private val M = Literal(64L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _)
          if eligible(groupExprs, aggExprs) =>
        val groups = groupExprs.map(_.asInstanceOf[Attribute])
        val (countAlias, key) = theCountDistinct(aggExprs).get
        rewrite(groups, aggExprs, countAlias, key, child)
    }

  /** exactly one count(distinct integral-key), everything else grouping
    * attributes that pass through unchanged */
  private def eligible(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression]): Boolean = {
    val allGroupsAttrs = groupExprs.forall(_.isInstanceOf[Attribute])
    val cds = aggExprs.flatMap(collectCountDistinct)
    val passthrough = aggExprs.forall {
      case a: Attribute => groupExprs.exists(_.semanticEquals(a))
      case Alias(_: AggregateExpression, _) => true
      case _ => false
    }
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    allGroupsAttrs && passthrough && cds.length == 1 &&
      aggExprs.count(_.isInstanceOf[Alias]) == 1 &&
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(cds.head._2.dataType)
  }

  private def collectCountDistinct(
      ne: NamedExpression): Seq[(Alias, Expression)] = ne match {
    case a @ Alias(AggregateExpression(Count(Seq(k)), _, true, None, _), _) =>
      Seq((a, k))
    case _ => Seq.empty
  }

  private def theCountDistinct(
      aggExprs: Seq[NamedExpression]): Option[(Alias, Expression)] =
    aggExprs.flatMap(collectCountDistinct).headOption

  private def aggExpr(f: AggregateFunction): AggregateExpression =
    AggregateExpression(f, Complete, isDistinct = false)

  private def rewrite(groups: Seq[Attribute], aggExprs: Seq[NamedExpression],
      countAlias: Alias, key: Expression, child: LogicalPlan): LogicalPlan = {
    // ---- stage 1: portable avalanche hash (Project) ----
    def fold(h: Expression, mult: Long): Expression =
      Pmod(Multiply(Add(h, ShiftRight(h, Literal(13, IntegerType))),
        Literal(mult, LongType)), P)
    val h0 = Pmod(Multiply(Pmod(Cast(key, LongType), P),
      Literal(2654435761L, LongType)), P)
    val hAl = Alias(fold(fold(h0, 972663749L), 468703703L), "__h")()
    val p1 = Project(groups :+ hAl, child)
    val h = hAl.toAttribute
    // ---- stage 2: bucket + rho (Project) ----
    val w = IntegralDivide(h, M)
    val rho = If(EqualTo(w, Literal(0L, LongType)),
      Literal(25L, LongType),
      Add(Cast(BitwiseCount(Subtract(BitwiseAnd(w, UnaryMinus(w)),
        Literal(1L, LongType))), LongType), Literal(1L, LongType)))
    val bucketAl = Alias(Pmod(h, M), "__bucket")()
    val rhoAl = Alias(rho, "__rho")()
    val p2 = Project(groups ++ Seq(bucketAl, rhoAl), p1)
    // ---- stage 3: per-(groups, bucket) max rho (the sketch merge) ----
    val mjAl = Alias(aggExpr(Max(rhoAl.toAttribute)), "__mj")()
    val a1 = Aggregate(groups :+ bucketAl.toAttribute,
      (groups :+ bucketAl.toAttribute) :+ mjAl, p2)
    // ---- stage 4: integer-scaled harmonic sum per group ----
    val pow = ShiftLeft(Literal(1L, LongType),
      Cast(Subtract(Literal(30L, LongType), mjAl.toAttribute), IntegerType))
    val sAl = Alias(
      Add(aggExpr(Sum(pow)),
        Multiply(Subtract(M, aggExpr(Count(Seq(Literal(1))))),
          Literal(1L << 30, LongType))), "__s")()
    val a2 = Aggregate(groups, groups :+ sAl, a1)
    // ---- stage 5: the estimate, rounded to a count, ORIGINAL exprId ----
    val est = Divide(
      Multiply(Multiply(Literal(0.709436, DoubleType),
        Literal(4096.0, DoubleType)), Literal(1073741824.0, DoubleType)),
      Cast(sAl.toAttribute, DoubleType))
    val counted = Cast(Round(est, Literal(0, IntegerType)), LongType)
    val outCount = Alias(counted, countAlias.name)(exprId = countAlias.exprId)
    // preserve the caller's output order (groups and the count column)
    val out = aggExprs.map {
      case a: Attribute => a
      case a: Alias if a.exprId == countAlias.exprId => outCount
      case other => other
    }
    Project(out, a2)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * A web-scraped corpus mixes precomposed and decomposed forms of the
  * same text ("é" as U+00E9 vs "e"+U+0301), which silently splits exact
  * dedup groups, n-gram shingles, and tokenizer merges that are
  * byte-keyed. Canonical composition (NFC) is therefore the first pass
  * of every text-cleaning pipeline. Spark has no built-in for it, so
  * this is the intended extension shape: a one-argument Catalyst
  * `UnaryExpression` whose doGenCode emits a direct static call — stays
  * inside WholeStageCodegen, no UDF SerDe, null handled by the standard
  * scaffolding. The kernel is `java.text.Normalizer` (ICU-equivalent
  * for the canonical forms, part of the JDK), with an ASCII fast path:
  * NFC is the identity on pure-ASCII strings, so the common-case row
  * pays one byte scan and zero allocation.
  */
object TextNorm {

  /** NFC-normalize; ASCII strings (the overwhelming majority of a web
    * corpus after language bucketing) return the input object itself. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var ascii = true
    while (ascii && i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string)` — canonical-composition normalization. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormFunctions {
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(text)))

  /** Register for SQL / expr() use (same name as the DuckDB builtin the
    * oracle replays with). Called from [[GraftFunctions.register]] so
    * every registration path (Dev session, tests) gets it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      exprs => {
        require(exprs.length == 1,
          s"nfc_normalize takes exactly 1 argument, got ${exprs.length}")
        NfcNormalizeExpr(exprs.head)
      },
      "built-in")
}

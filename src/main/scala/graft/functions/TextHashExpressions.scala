package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass JVM kernels for the engine-portable text-hash family
  * (polynomial folds mod 1e9+7; see graft.ops.TextAnalysis).
  *
  * The Column-expression formulations (`split` -> `transform` ->
  * `aggregate`) are semantically identical but allocate one boxed array
  * per token per row inside the HOF chain; these kernels walk the
  * UTF8String once with primitive locals. Semantics replicate the HOF
  * chain exactly, including the edge cases: `split(text, ' ')` keeps
  * empty tokens (leading/trailing/double spaces), and an empty token
  * folds one `ascii('') = 0` step, giving (7*31+0) mod P = 217.
  */
object TextHash {
  final val P = 1000000007L

  /** Per-token polynomial hashes; mirrors TextAnalysis.tokenHashes. */
  def tokenHashArray(str: String): Array[Long] = {
    val out = new java.util.ArrayList[java.lang.Long]
    var acc = 7L
    var empty = true
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        out.add(if (empty) 217L else acc)
        acc = 7L; empty = true
      } else {
        acc = (acc * 31L + cp) % P
        empty = false
      }
      i += Character.charCount(cp)
    }
    out.add(if (empty) 217L else acc)
    val res = new Array[Long](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    res
  }

  /** Distinct hashed n-gram shingles (first-occurrence order); mirrors
    * TextAnalysis.hashedNgrams' shifted-zip fold + array_distinct. */
  def hashedNgramArray(str: String, n: Int): Array[Long] = {
    val th = tokenHashArray(str)
    val m = th.length - n + 1
    if (m <= 0) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var i = 0
    while (i < m) {
      var g = th(i)
      var j = 1
      while (j < n) { g = (g * 131L + th(i + j)) % P; j += 1 }
      seen.add(g)
      i += 1
    }
    val res = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { res(k) = it.next(); k += 1 }
    res
  }

  /** MinHash signature: per seed s, min over values of
    * (a(s)*x + b(s)) mod P; empty input yields the P sentinel. Mirrors
    * graft.ops.Dedup.minHashSignature's fold exactly. */
  def minHashSig(values: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = a.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, P)
    var i = 0
    val m = values.numElements()
    while (i < m) {
      val x = values.getLong(i)
      var s = 0
      while (s < n) {
        val h = (a(s) * x + b(s)) % P
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash bit signature: bit j = 1 iff the sum over values of
    * (+1 if (a(j)*x+b(j)) mod P is odd else -1) is positive. Mirrors
    * graft.ops.Dedup.simHashSig's fold exactly. */
  def simHashSig(values: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = a.length
    val counts = new Array[Long](n)
    var i = 0
    val m = values.numElements()
    while (i < m) {
      val x = values.getLong(i)
      var j = 0
      while (j < n) {
        counts(j) += ((a(j) * x + b(j)) % P % 2L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    val bits = new Array[Long](n)
    var j = 0
    while (j < n) { bits(j) = if (counts(j) > 0) 1L else 0L; j += 1 }
    new GenericArrayData(bits)
  }

  /** Hamming distance between two equal-length long arrays (count of
    * differing positions; single pass, no allocation). */
  def hammingCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) != b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Intersection size of two ascending-sorted long arrays (single merge
    * pass, no hash sets, no allocation). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** All deletion-neighborhood hashes of a string — the string itself
    * plus every single-CODE-POINT deletion — via rolling polynomial
    * prefix/suffix hashes: O(len) total where the
    * substr+concat+xxhash64 expression chain this replaces paid O(len)
    * per variant (O(len^2) total) plus a UTF8String allocation per
    * variant. Deduplicated keeping first occurrence (repeated code
    * points produce identical deletions).
    *
    * Only hash EQUALITY matters to the caller
    * (graft.ops.Fuzzy.editDistance1Join verifies candidates with exact
    * levenshtein, and a Bloom-style false candidate dies there), so the
    * hash family is free to differ from xxhash64; each value is the
    * seeded wrapping-64-bit polynomial of the RESULTING string's code
    * points — a pure function of the variant's content, so equal
    * variants collide by construction across any two source strings.
    * Code-point (not Java-char) deletions mirror substring/levenshtein
    * semantics: deleting half a surrogate pair would break the
    * share-a-variant property for astral-plane text (pinned in
    * FuzzySpec). Shuffle spread needs no finalizer — hash partitioning
    * Murmur3-mixes column values itself. */
  def deletionNeighborhoodHashes(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints.toArray
    val L = cps.length
    val B = 1000003L
    // pre(i) = seeded poly of cps[0..i-1]; pow(i) = B^i;
    // suf(i) = unseeded positional poly of cps[i..L-1]
    val pre = new Array[Long](L + 1)
    val pow = new Array[Long](L + 1)
    val suf = new Array[Long](L + 1)
    pre(0) = 7L; pow(0) = 1L; suf(L) = 0L
    var i = 0
    while (i < L) {
      pre(i + 1) = pre(i) * B + cps(i)
      pow(i + 1) = pow(i) * B
      i += 1
    }
    i = L - 1
    while (i >= 0) { suf(i) = cps(i) * pow(L - 1 - i) + suf(i + 1); i -= 1 }
    val out = new Array[Long](L + 1)
    var n = 0
    def add(h: Long): Unit = {
      var j = 0; var dup = false
      while (j < n && !dup) { dup = out(j) == h; j += 1 }
      if (!dup) { out(n) = h; n += 1 }
    }
    add(pre(L)) // the string itself
    i = 0
    while (i < L) {
      // seeded poly of cps[0..i-1] ++ cps[i+1..L-1] in O(1):
      // the seed and prefix shift past the (L-1-i)-long suffix
      add(pre(i) * pow(L - 1 - i) + suf(i + 1))
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  // codegen entry points (UTF8String in, Catalyst ArrayData out)
  def tokenHashes(s: UTF8String): ArrayData =
    new GenericArrayData(tokenHashArray(s.toString))
  def hashedNgrams(s: UTF8String, n: Int): ArrayData =
    new GenericArrayData(hashedNgramArray(s.toString, n))
}

abstract class TextHashBase extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
}

/** array<long> of per-token polynomial hashes (codegen'd static call). */
case class TokenHashesExpr(child: Expression) extends TextHashBase {
  override def prettyName: String = "token_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of distinct hashed word n-grams (codegen'd static call). */
case class HashedNgramsExpr(child: Expression, n: Int) extends TextHashBase {
  override def prettyName: String = "hashed_ngrams"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.hashedNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.hashedNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

abstract class SeedSigBase extends UnaryExpression {
  def coefA: Seq[Long]
  def coefB: Seq[Long]
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.simpleString}")
    }
  // the coefficient tables live in generated-class fields, not inline code
  protected def coefRefs(ctx: CodegenContext): (String, String) = {
    val a = ctx.addReferenceObj("coefA", coefA.toArray, "long[]")
    val b = ctx.addReferenceObj("coefB", coefB.toArray, "long[]")
    (a, b)
  }
}

/** MinHash signature over a pre-hashed shingle array (native kernel). */
case class MinHashSigExpr(child: Expression, coefA: Seq[Long], coefB: Seq[Long])
    extends SeedSigBase {
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minHashSig(input.asInstanceOf[ArrayData], coefA.toArray, coefB.toArray)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (a, b) = coefRefs(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minHashSig($c, $a, $b)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash 0/1 bit signature over a token-hash array (native kernel). */
case class SimHashSigExpr(child: Expression, coefA: Seq[Long], coefB: Seq[Long])
    extends SeedSigBase {
  override def prettyName: String = "simhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simHashSig(input.asInstanceOf[ArrayData], coefA.toArray, coefB.toArray)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (a, b) = coefRefs(ctx)
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simHashSig($c, $a, $b)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two equal-length array<bigint> columns. */
case class HammingExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "hamming"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.hammingCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.hammingCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two ascending-sorted array<bigint> columns. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** array<long> of deletion-neighborhood hashes (codegen'd static call). */
case class DeletionNeighborhoodExpr(child: Expression) extends TextHashBase {
  override def prettyName: String = "deletion_neighborhood_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHash.deletionNeighborhoodHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.deletionNeighborhoodHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextHashFunctions {
  /** Column wrappers for the native expressions. */
  def tokenHashes(text: Column): Column =
    GraftColumnBridge.column(TokenHashesExpr(GraftColumnBridge.expression(text)))
  def deletionNeighborhoodHashes(text: Column): Column =
    GraftColumnBridge.column(
      DeletionNeighborhoodExpr(GraftColumnBridge.expression(text)))
  def hashedNgrams(text: Column, n: Int): Column =
    GraftColumnBridge.column(HashedNgramsExpr(GraftColumnBridge.expression(text), n))
  def minHashSig(values: Column, coefA: Seq[Long], coefB: Seq[Long]): Column =
    GraftColumnBridge.column(
      MinHashSigExpr(GraftColumnBridge.expression(values), coefA, coefB))
  def simHashSig(values: Column, coefA: Seq[Long], coefB: Seq[Long]): Column =
    GraftColumnBridge.column(
      SimHashSigExpr(GraftColumnBridge.expression(values), coefA, coefB))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCountExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(HammingExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register for SQL / expr() use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("token_hashes",
      exprs => TokenHashesExpr(exprs.head), "built-in")
  }
}

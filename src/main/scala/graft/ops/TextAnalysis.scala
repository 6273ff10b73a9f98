package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, n-gram shingling, quality scoring, heuristic language ID,
  * and document fingerprinting.
  *
  * All operators are pure Column expressions (codegen'd, no UDFs), so they
  * stay inside WholeStageCodegen and scale linearly with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (single-space-delimited corpus). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles (n consecutive tokens joined by a
    * space).
    *
    * Implemented by zipping n shifted copies of the token array instead of
    * indexing `w` inside a per-token lambda: Catalyst inlines column
    * references into lambda bodies (CollapseProject counts static
    * references, not runtime multiplicity), so an `element_at(w, i+j)`
    * formulation re-evaluates split() per token — measured O(tokens^2)
    * per row. Here every `w` reference sits in a zip_with/slice ARGUMENT,
    * which is evaluated once per row. zip_with pads the shorter (shifted)
    * arrays with null and concat propagates null, so positions past
    * #tokens-n drop out in the filter. */
  def ngrams(text: Column, n: Int): Column = {
    val w = tokens(text)
    val zipped = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    array_distinct(filter(zipped, g => g.isNotNull))
  }

  private val Mod = 1000000007L

  /** Per-token polynomial hash (fold(acc*31 + codepoint) mod 1e9+7) —
    * the engine-portable hash family also used by `fingerprint`, so
    * DuckDB oracles can reproduce it exactly. Backed by the native
    * codegen expression (one pass over the string, primitive locals);
    * [[tokenHashesHof]] is the pure-Column reference formulation. */
  def tokenHashes(text: Column): Column =
    graft.functions.TextHashFunctions.tokenHashes(text)

  /** HOF reference implementation of [[tokenHashes]] (kept for the
    * native-vs-expression parity spec). */
  private[graft] def tokenHashesHof(text: Column): Column =
    transform(tokens(text), t =>
      aggregate(transform(split(t, ""), c => ascii(c).cast("long")),
        lit(7L), (a, c) => (a * lit(31L) + c) % lit(Mod)))

  /** Distinct HASHED n-gram shingles (token hashes combined with *131
    * folds). Long shingles make downstream set-intersections ~an order
    * of magnitude cheaper than string shingles; collisions (~1e-9/pair)
    * are deterministic and identical in any engine using the same fold.
    * Backed by the native codegen expression; [[hashedNgramsHof]] is the
    * pure-Column reference. */
  def hashedNgrams(text: Column, n: Int): Column =
    graft.functions.TextHashFunctions.hashedNgrams(text, n)

  /** HOF reference implementation of [[hashedNgrams]]: shifted-zip folds
    * (the CollapseProject-safe shape — `element_at(th, i+j)` inside a
    * per-position lambda would re-evaluate the tokenization per token). */
  private[graft] def hashedNgramsHof(text: Column, n: Int): Column = {
    val th = tokenHashesHof(text)
    val zipped = (1 until n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), greatest(size(th) - j, lit(0))),
        (a, b) => (a * lit(131L) + b) % lit(Mod))
    }
    array_distinct(filter(zipped, g => g.isNotNull))
  }

  /** Jaccard similarity of two pre-computed distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Mean token length assuming single-space delimiting:
    * (chars - separators) / tokens. */
  def meanTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    (length(text).cast("double") - (n - lit(1))) / n
  }

  /** Fraction of characters that are lowercase a-z (quality signal). */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-z]", "")).cast("double") / length(text)

  /** Stopword hit lists per language for the heuristic language ID.
    * Tiny on purpose: broadcast as literals into codegen. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "que", "y", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "dans", "pour"),
    "zh" -> Seq("的", "是", "在", "了", "我", "不"))

  /** Heuristic n-gram/stopword language ID: language with the most
    * distinct stopword hits wins; ties break in `stopwords` order;
    * zero hits => "und". Pure set-intersection expressions. */
  def langIdPredicted(text: Column): Column = {
    val w = array_distinct(tokens(text))
    val hits = stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(w, typedLit(words)))
    }
    val all = hits.map(_._2)
    hits.zipWithIndex.foldRight(lit("und")) {
      case (((lang, h), i), elsE) =>
        // h wins if positive and >= every later language's hits (earlier
        // ones already had their chance in the fold's when-chain)
        val laterGe = all.drop(i + 1).foldLeft(h > 0)((c, o) => c && h >= o)
        when(laterGe, lit(lang)).otherwise(elsE)
    }
  }

  /** 64-bit-ish polynomial rolling-hash fingerprint over the character
    * stream: fold(acc*31 + codepoint) mod 1e9+7. Stable across engines
    * (pure integer arithmetic, no overflow within Long). */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(7L),
      (acc, c) => (acc * lit(31L) + c) % lit(1000000007L))

  /** Per-document quality feature frame. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      round(meanTokenLength(t), 4).as("avg_token_len"),
      round(alphaRatio(t), 6).as("alpha_ratio"))
  }

  /** Occurrence count of the most frequent word bigram, computed wholly
    * per-row: build the bigram array (shifted-zip — the CollapseProject-
    * safe shape, see [[ngrams]]), sort it, and fold a longest-equal-run
    * scan over the sorted array. No explode, no shuffle: the repetition
    * scan of a 100 TB corpus stays embarrassingly parallel map work,
    * where an unnest+groupBy formulation (the DuckDB oracle) would
    * shuffle one row per bigram occurrence. */
  def topBigramCount(text: Column): Column = {
    val w = tokens(text)
    val bg = zip_with(slice(w, lit(1), greatest(size(w) - 1, lit(0))),
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    aggregate(array_sort(bg),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Gopher-style repetition filter features: duplicate-token fraction
    * and the fraction of bigram slots taken by the single most frequent
    * bigram; docs whose top bigram covers >= `flagThreshold` of all
    * bigram slots are flagged boilerplate/degenerate. */
  def repetitionFeatures(docs: DataFrame, textCol: String = "text",
      flagThreshold: Double = 0.2): DataFrame = {
    val t = col(textCol)
    val w = tokens(t)
    docs.select(
        col("doc_id"),
        tokenCount(t).as("n_tokens"),
        round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 6)
          .as("dup_token_frac"),
        topBigramCount(t).as("top_bigram_n"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("top_bigram_n"),
        round(col("top_bigram_n").cast("double") /
          when(col("n_tokens") - 1 > 0, col("n_tokens") - 1), 6)
          .as("frac_top_bigram"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("top_bigram_n"), col("frac_top_bigram"),
        when(col("frac_top_bigram") >= flagThreshold, lit(1)).otherwise(lit(0))
          .cast("int").as("flagged"))
  }

  /** PII patterns a pre-training scrub pass must catch. Kept to the
    * regex subset whose semantics are identical between Java regex
    * (Spark) and RE2 (DuckDB/Go tooling): character classes,
    * quantifiers, alternation — no backrefs, no lookaround — so the
    * scrub is portable and oracle-replayable. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+?[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ]?[0-9]{2,4}",
    "ipv4"  -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Redact every PII match with a typed placeholder token. Pure
    * chained regexp_replace — codegen'd, zero shuffle, linear scan:
    * the shape a 100 TB scrub pass must have (the regex NFA cost is
    * per-byte; nothing leaves the row). */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<$kind>")
    }

  /** Per-category PII match counts (for scrub audit reports). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (kind, pat) =>
      kind -> size(regexp_extract_all(text, lit(pat), lit(0)))
    }
}

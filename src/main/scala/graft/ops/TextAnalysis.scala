package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  def ngrams(text: Column, n: Int): Column =
    array_distinct(ngramOccurrences(text, n))

  /** All n-gram occurrences in order (duplicates kept) — the counting
    * variant of [[ngrams]]; same zip-of-shifted-copies shape for the same
    * CollapseProject reason. */
  def ngramOccurrences(text: Column, n: Int): Column = {
    val w = tokens(text)
    val zipped = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(zipped, g => g.isNotNull)
  }

  private val Mod = 1000000007L

  /** POSITIONAL hashed n-grams: entry i is the hash of the n tokens
    * starting at 0-based position i, with the trailing n-1 entries null —
    * array index IS corpus position, duplicates kept (the native
    * [[hashedNgrams]] kernel dedups for shingle-set ops, which silently
    * misaligns positions the moment a document repeats an n-gram — fatal
    * for span/diagonal logic). Same shifted-zip fold shape as
    * [[ngramOccurrences]]; zip_with's null padding provides the trailing
    * nulls and null propagates through the fold. */
  def hashedNgramOccurrences(text: Column, n: Int): Column = {
    val th = tokenHashes(text)
    (1 until n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), greatest(size(th) - j, lit(0))),
        (a, b) => pmod(a * lit(131L) + b, lit(Mod)))
    }
  }

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

  /** POSITIONAL hashed n-grams, aligned with the token array: element i
    * is the hash of the n-gram STARTING at token i, null for the last
    * n-1 positions (zip_with's null padding). Unlike [[hashedNgrams]]
    * this keeps duplicates and positions — the shape span-level scrub
    * passes need. Same shifted-zip formulation (a per-position
    * element_at lambda would re-evaluate the tokenization per token,
    * see [[ngrams]]). */
  private[graft] def positionalHashedNgrams(text: Column, n: Int): Column = {
    val th = tokenHashes(text)
    (1 until n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), greatest(size(th) - j, lit(0))),
        (a, b) => (a * lit(131L) + b) % lit(Mod))
    }
  }

  /** C4/RefinedWeb-style boilerplate scrub at n-gram-span granularity:
    * any n-gram occurring in more than `maxDocFrac` of all documents is
    * boilerplate, and every token covered by an occurrence of a flagged
    * n-gram is removed from the document (the corpus has no line
    * structure, so the span — not the line — is the removal unit).
    *
    * Scale shape (the 100 TB pass): one shuffle aggregates 8-byte hashed
    * n-grams into doc frequencies (map-side partial combine); the
    * flagged set is bounded by construction — at most
    * avg_grams_per_doc / maxDocFrac entries (sum of df over all grams =
    * corpus gram count, and each flagged gram's df exceeds
    * maxDocFrac*N) — so it collapses to a single broadcast array, and
    * the scrub itself is pure per-row map work. Texts never shuffle.
    *
    * Output: doc_id, n_flagged (occurrences of flagged grams),
    * n_tokens_kept, text_scrubbed.
    */
  def boilerplateScrub(docs: DataFrame, n: Int = 3,
      maxDocFrac: Double = 0.1, textCol: String = "text"): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2: $n")
    require(maxDocFrac > 0 && maxDocFrac < 1,
      s"maxDocFrac must be in (0,1): $maxDocFrac")
    val t = col(textCol)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // df per DISTINCT-in-doc gram == document frequency (one shuffle,
    // partially aggregated; the value shuffled is an 8-byte hash).
    val flagged = docs
      .select(explode(hashedNgrams(t, n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") > col("n_docs") * maxDocFrac)
      .agg(sort_array(collect_list(col("gram"))).as("bad"))
    docs.crossJoin(broadcast(flagged))
      .select(col("doc_id"), tokens(t).as("w"),
        transform(positionalHashedNgrams(t, n),
          g => g.isNotNull && array_contains(col("bad"), g)).as("flags"))
      .select(col("doc_id"), col("w"), col("flags"),
        // covered(i) = OR of flags[i-n+1..i]: OR-fold of right-shifted
        // copies of flags (shift j = j prepended falses), truncated back
        // to the token count. Shifted-zip again — the arguments are
        // evaluated once per row, a per-token slice lambda would not be.
        (1 until n).foldLeft(col("flags")) { (acc, j) =>
          zip_with(acc,
            slice(concat(array_repeat(lit(false), j), col("flags")),
              lit(1), size(col("flags"))),
            (a, b) => a || coalesce(b, lit(false)))
        }.as("covered"))
      .select(col("doc_id"),
        size(filter(col("flags"), b => b)).as("n_flagged"),
        filter(zip_with(col("w"), col("covered"),
          (tok, c) => when(c, lit(null)).otherwise(tok)),
          x => x.isNotNull).as("kept"))
      .select(col("doc_id"), col("n_flagged"),
        size(col("kept")).as("n_tokens_kept"),
        array_join(col("kept"), " ").as("text_scrubbed"))
  }

  /** Fixed-token-budget document chunking with overlap — the context-
    * window splitter of a training/RAG pipeline. Chunk c starts at
    * token 1 + c*(budget-overlap); starts run while start <=
    * max(len - overlap, 1), which guarantees full coverage (the last
    * chunk always reaches the final token) and that every chunk except
    * the first repeats exactly `overlap` tokens of its predecessor
    * (the last one possibly fewer tokens total). Pure per-row
    * explode — zero shuffle at any scale. */
  def chunkByTokens(docs: DataFrame, budget: Int, overlap: Int,
      textCol: String = "text"): DataFrame = {
    require(budget > 0 && overlap >= 0 && overlap < budget,
      s"need 0 <= overlap < budget: budget=$budget overlap=$overlap")
    val stride = budget - overlap
    docs
      .select(col("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), greatest(size(col("w")) - overlap, lit(1)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        ((col("start") - 1) / lit(stride)).cast("long").as("chunk_id"),
        col("start"), slice(col("w"), col("start"), lit(budget)).as("c"))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        size(col("c")).as("n_tokens"),
        array_join(col("c"), " ").as("chunk_text"))
  }

  /** Top-k most distinctive terms per document by TF-IDF with a LINEAR
    * inverse document frequency (score = tf * N / df). The linear idf
    * keeps the score an IEEE-exact integer ratio — identical bit
    * patterns in any engine — where log-idf differs in the last ulp
    * between libm implementations and poisons hash-compare oracles;
    * the ranking family is the same (monotone in tf, anti-monotone in
    * df).
    *
    * Scale shape: tf is one (doc_id, token) shuffle with map-side
    * combine; df reduces tf to the vocabulary (tiny after partial agg)
    * and joins back as a BROADCAST; the per-doc top-k window
    * re-shuffles on doc_id only. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3,
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Corpus-LM coverage scoring (the CCNet-style "does this doc look like
    * the corpus" quality signal, kept integer-exact so it oracles): the
    * language model is the corpus's own bigram table. Per doc —
    * `n_bigrams` adjacent-pair occurrences, `covered_occ` of them whose
    * bigram appears in >= `minDf` distinct docs, `coverage` their ratio,
    * and `mean_df` the occurrence-weighted mean document frequency. Low
    * coverage flags out-of-distribution / noise docs; log-prob scoring is
    * deliberately avoided (ln() is not bit-portable across engines).
    *
    * Scale shape: three keyed shuffles, none broadcast — (doc_id, bigram)
    * count with map-side combine, bigram -> df reduce (tiny after partial
    * agg), df joined back on the bigram key (the bigram vocabulary of a
    * 100 TB corpus is itself large, so this is a shuffle equi-join, NOT a
    * broadcast), then one doc_id rollup. Docs with no bigram (single
    * token) drop out, mirroring the oracle's unnest. */
  def bigramCoverage(docs: DataFrame, minDf: Long = 2,
      textCol: String = "text"): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1: $minDf")
    val perDoc = docs
      .select(col("doc_id"), explode(ngramOccurrences(col(textCol), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("occ"))
    val dfv = perDoc.groupBy(col("bigram")).agg(count(lit(1)).as("df"))
    perDoc.join(dfv, "bigram")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("occ")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("df") >= minDf, col("occ")).otherwise(0L)).as("covered_occ"),
        round(sum(when(col("df") >= minDf, col("occ")).otherwise(0L)) /
          sum(col("occ")).cast("double"), 6).as("coverage"),
        round(sum(col("occ") * col("df")) /
          sum(col("occ")).cast("double"), 6).as("mean_df"))
  }

  /** Add-one-smoothed bigram language-model score — the CCNet/KenLM
    * "how probable is this doc under the corpus LM" quality signal that
    * [[bigramCoverage]]'s df-threshold only approximates. The model is
    * the corpus's own bigram table with Laplace smoothing:
    * `P(b|a) = (c(ab)+1) / (c(a)+V)` where `c(a)` counts occurrences of
    * `a` as a bigram context and `V` is the corpus vocabulary size.
    * Real LM scoring multiplies these (log-sums); ln() is not
    * bit-portable across engines (the [[bigramCoverage]] rationale), so
    * each conditional probability is fixed-pointed FIRST —
    * `p_ppm = ((c_ab+1) * 1e6) div (c_a+V)`, an integer — and the doc
    * score is the occurrence-weighted integer mean `avg_ppm`. Every step
    * is integer arithmetic, so the score is engine-exact, summation-order
    * independent, and the DuckDB oracle replays the whole model build.
    *
    * Scale shape: (doc, bigram) counts partial-aggregate map-side; the
    * model tables are keyed reduces of that (bigram -> c_ab, context ->
    * c_a); both join back on their keys as shuffle equi-joins — a 100 TB
    * corpus's bigram vocabulary is itself huge, so nothing here assumes
    * broadcast except the single-row vocabulary count. Docs with fewer
    * than 2 tokens have no bigram and drop out, mirroring the oracle. */
  def bigramLmScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(ngramOccurrences(col(textCol), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("occ"))
    val cb = perDoc.groupBy(col("bigram")).agg(sum(col("occ")).as("c_ab"))
    val ca = cb
      .withColumn("__ctx", element_at(split(col("bigram"), " "), 1))
      .groupBy(col("__ctx")).agg(sum(col("c_ab")).as("c_a"))
    val vocab = docs
      .select(explode(tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__v"))
    val probs = cb
      .withColumn("__ctx", element_at(split(col("bigram"), " "), 1))
      .join(ca, "__ctx")
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        expr("((c_ab + 1) * 1000000) div (c_a + __v)").as("p_ppm"))
    perDoc.join(probs, "bigram")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("occ")).as("n_bigrams"),
        expr("sum(occ * p_ppm) div sum(occ)").as("avg_ppm"),
        min(col("p_ppm")).as("min_ppm"))
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

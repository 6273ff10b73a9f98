package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-style merge training over token sequences — the
  * tokenizer-training shape of an LLM data pipeline (Sennrich et al.
  * 2016, at the word level: merged units are phrases).
  *
  * Each round finds the corpus-wide most frequent adjacent symbol pair
  * and rewrites every sequence with that pair merged greedily
  * left-to-right (the BPE application rule), then repeats on the
  * rewritten corpus. Symbols are portable polynomial token hashes
  * (mod 1e9+7, the [[TextAnalysis.tokenHashes]] family); merged symbols
  * get ids above the hash modulus (`1e9+7 + round`) so they can never
  * collide with a token hash.
  *
  * Everything is deterministic and integer-exact: the arg-max breaks
  * ties by (count desc, sym_a asc, sym_b asc) — a total order — so the
  * distributed result is bit-identical to a single-threaded replay
  * ([[bpeMergesReplay]]), which is what the generated verify-time
  * oracle pins.
  *
  * Scale shape (the 100 TB tokenizer-training loop): per round, ONE
  * map-side pair explode + partially-aggregated groupBy(pair) for the
  * counts, a 1-row top-1 (TakeOrderedAndProject) that re-enters the
  * plan as a broadcast — never a driver round-trip — and a pure map
  * rewrite of the sequences (position-wise transform for distinct
  * pairs, where greedy matches provably cannot overlap; an explicit
  * left-to-right fold for self-pairs — see [[mergeExpr]]). Texts
  * shuffle ZERO times; only (pair, count) rows ever move. Sequence
  * lineage is localCheckpoint-truncated per round and superseded
  * checkpoints are released precisely, the [[Graph.pageRank]]
  * discipline.
  */
object Bpe {

  /** Symbol id space: token hashes live in [0, MOD); merge symbols at
    * MOD + round can never collide with them. */
  val Mod = 1000000007L

  /** Greedy left-to-right merge of pair (a, b) into `merged`.
    *
    * Two shapes behind one door, picked per row by the (row-constant)
    * `a === b` test: when a != b, consecutive matches CANNOT overlap
    * (positions i and i+1 both matching forces a == b), so greedy
    * equals ALL match positions and the rewrite is a position-wise
    * `transform` + null `filter` — O(k) with `get()` neighbor lookups
    * on the array attribute, no per-element array copying. The
    * self-pair case (runs of `a` merge every other occurrence) keeps
    * the explicit left-to-right fold ([[mergeFold]]). The fold is the
    * semantics; the position-wise path is the fast equivalent, and
    * BpeSpec pins their equality against the scalar replay. */
  private def mergeExpr(seq: Column, a: Column, b: Column,
      merged: Column): Column =
    when(a === b, mergeFold(seq, a, b, merged))
      .otherwise(filter(
        transform(seq, (x, i) =>
          when(x === a && get(seq, i + lit(1)) === b, merged)
            .when(x === b && get(seq, i - lit(1)) === a,
              lit(null).cast("bigint"))
            .otherwise(x)),
        y => y.isNotNull))

  /** Greedy left-to-right non-overlapping merge of the pair (a, b) into
    * `merged`, as an `aggregate` fold — the reference semantics, and
    * the execution path for the self-pair (a == b) case. State:
    * (out, pending) where pending means the previous symbol was an
    * unconsumed `a` waiting to see whether the next symbol is `b`. */
  private def mergeFold(seq: Column, a: Column, b: Column,
      merged: Column): Column = {
    val init = struct(
      array().cast("array<bigint>").as("out"), lit(false).as("pending"))
    aggregate(
      seq,
      init,
      (st, t) => {
        val out = st.getField("out")
        val pend = st.getField("pending")
        when(pend && t === b,
          struct(concat(out, array(merged)).as("out"),
            lit(false).as("pending")))
          .when(pend && t === a,
            struct(concat(out, array(a)).as("out"), lit(true).as("pending")))
          .when(pend,
            struct(concat(out, array(a), array(t)).as("out"),
              lit(false).as("pending")))
          .when(t === a, struct(out.as("out"), lit(true).as("pending")))
          .otherwise(
            struct(concat(out, array(t)).as("out"), lit(false).as("pending")))
      },
      st => concat(st.getField("out"),
        when(st.getField("pending"), array(a))
          .otherwise(array().cast("array<bigint>"))))
  }

  /** Adjacent symbol pairs of a sequence (positions i, i+1), PACKED as
    * one long `sym_a << 31 | sym_b` — both symbols are non-negative and
    * bounded by MOD + 65536 < 2^31 (token hashes are mod 1e9+7; merge
    * ids top out at MOD + the 65536 merge cap), so the packing is exact
    * and `packed ASC` orders identically to `(sym_a ASC, sym_b ASC)`.
    * Packing halves the pair-count shuffle key (8 bytes vs a 2-long
    * struct) and gives the partial aggregate a primitive hash key —
    * guide §2.3, narrower types on the hot shuffle. One slice + one
    * indexed transform, where the struct form paid two slices plus a
    * zip_with materialization. */
  private def adjacentPackedPairs(seq: Column): Column =
    transform(
      slice(seq, lit(2), size(seq) - 1),
      (y, i) => shiftleft(get(seq, i), 31) + y)

  private[ops] def unpackPair(pk: Long): (Long, Long) =
    (pk >>> 31, pk & ((1L << 31) - 1))

  /** Train `rounds` merges over the corpus. Output: one row per round,
    * (merge_round, sym_a, sym_b, pair_count, merged_sym), where
    * pair_count is the corpus-wide frequency of the winning pair at the
    * time it was chosen. */
  def bpeMerges(docs: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds in [1,64]: $rounds")
    val sc = docs.sparkSession.sparkContext
    def checkpointWithIds(df: DataFrame): (DataFrame, Set[Int]) = {
      val pre = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- pre).toSet)
    }
    var (seqs, seqIds) = checkpointWithIds(
      docs.select(TextAnalysis.tokenHashes(col(textCol)).as("seq"))
        .filter(size(col("seq")) >= 2))
    var merges = Vector.empty[DataFrame]
    (0 until rounds).foreach { r =>
      val best = seqs
        .select(explode(adjacentPackedPairs(col("seq"))).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("pair_count"))
        // packed ASC == (sym_a ASC, sym_b ASC): the identical total order
        .orderBy(col("pair_count").desc, col("pk"))
        .limit(1)
        .select(shiftrightunsigned(col("pk"), 31).as("sym_a"),
          col("pk").bitwiseAND(lit((1L << 31) - 1)).as("sym_b"),
          col("pair_count"))
        .withColumn("merge_round", lit(r))
        .withColumn("merged_sym", lit(Mod + r))
        .localCheckpoint(true) // 1 row; feeds both the output and the rewrite
      merges = merges :+ best
      if (r < rounds - 1) {
        val (next, nextIds) = checkpointWithIds(
          seqs.crossJoin(broadcast(
              best.select(col("sym_a").as("__ba"), col("sym_b").as("__bb"),
                col("merged_sym").as("__bm"))))
            .select(mergeExpr(col("seq"), col("__ba"), col("__bb"),
              col("__bm")).as("seq"))
            .filter(size(col("seq")) >= 2))
        seqIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
        seqs = next
        seqIds = nextIds
      } else {
        seqIds.foreach(id =>
          sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
    merges.reduce(_ unionByName _)
      .select(col("merge_round"), col("sym_a"), col("sym_b"),
        col("pair_count"), col("merged_sym"))
      .orderBy(col("merge_round"))
  }

  /** Greedy selection of up to `want` PAIRWISE-DISJOINT pairs down a
    * candidate list already in the (count desc, sym_a, sym_b) total
    * order: a pair is taken iff neither of its symbols appears in an
    * already-taken pair. Shared by the distributed trainer and the
    * replay so the selection rule is one piece of code. */
  private[ops] def selectDisjoint(cands: Seq[(Long, Long, Long)],
      want: Int): Seq[(Long, Long, Long)] = {
    val used = scala.collection.mutable.HashSet.empty[Long]
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val it = cands.iterator
    while (sel.length < want && it.hasNext) {
      val c = it.next()
      if (!used.contains(c._1) && !used.contains(c._2)) {
        used += c._1; used += c._2; sel += c
      }
    }
    sel.toSeq
  }

  /** Candidate-list depth per round: enough total-order prefix to find
    * `batch` disjoint pairs in practice; both the distributed trainer
    * and the replay use the SAME cap, so even a cap-starved round (fewer
    * than `batch` disjoint pairs inside the prefix) selects identically
    * on both sides. */
  private def candidateCap(batch: Int): Int = batch * 8

  /** Batched BPE training — [[bpeMerges]] lifted past the
    * one-merge-per-round wall (a production tokenizer needs 10k+ merges;
    * at one pair per round that is 10k+ sequential job waves, a
    * driver-latency wall no executor count fixes). Each round selects
    * the top-`batch` PAIRWISE-DISJOINT pairs greedily down the same
    * (count desc, sym_a, sym_b) total order and rewrites the corpus
    * ONCE — O(totalMerges / batch) job waves.
    *
    * Why batch-start counts stay honest: selected pairs share no
    * symbols, and a merge (a,b)->m only consumes its own two symbols
    * and emits a brand-new one (m is fresh, and "a b" collapsing to "m"
    * never makes two other symbols adjacent that weren't), so applying
    * one selected merge can neither destroy nor create occurrences of
    * another selected pair. Every reported `pair_count` is therefore
    * exactly the count a sequential application of the batch would have
    * observed, and the rewrite is order-independent (applied in
    * selection order for determinism anyway).
    *
    * The per-round top-`candidateCap` candidate list is collected to the
    * driver and the selected merges re-enter the rewrite as closure
    * constants — the [[applyMerges]] contract: a merge table is bounded
    * vocabulary metadata, the one thing that SHOULD live on the driver
    * and every executor. Texts still never shuffle; per round the corpus
    * pays one pair-count partial agg and one zero-shuffle typed-map
    * rewrite ([[scalarMerge]], the same kernel the replay and apply side
    * use), with checkpoint-per-round lineage truncation and precise
    * release. Training stops early if the corpus runs out of pairs.
    *
    * Output: (merge_round, sym_a, sym_b, pair_count, merged_sym) with
    * merge_round the GLOBAL merge index (so `merged_sym = Mod + merge_round`
    * and the output is a drop-in merge table for [[applyMerges]]).
    * Bit-equality with the single-threaded [[bpeMergesBatchedReplay]] is
    * what the q145 verify-time oracle pins. */
  def bpeMergesBatched(docs: DataFrame, totalMerges: Int, batch: Int = 64,
      textCol: String = "text"): DataFrame = {
    require(totalMerges >= 1 && totalMerges <= 65536,
      s"totalMerges in [1,65536]: $totalMerges")
    require(batch >= 1 && batch <= 4096, s"batch in [1,4096]: $batch")
    val spark = docs.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    def checkpointWithIds(df: DataFrame): (DataFrame, Set[Int]) = {
      val pre = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      (out, (sc.getPersistentRDDs.keySet -- pre).toSet)
    }
    def release(ids: Set[Int]): Unit = ids.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    var (seqs, seqIds) = checkpointWithIds(
      docs.select(TextAnalysis.tokenHashes(col(textCol)).as("seq"))
        .filter(size(col("seq")) >= 2))
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    var done = 0
    var exhausted = false
    while (done < totalMerges && !exhausted) {
      val cands = seqs
        .select(explode(adjacentPackedPairs(col("seq"))).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("pair_count"))
        // packed ASC == (sym_a ASC, sym_b ASC): the identical total order
        .orderBy(col("pair_count").desc, col("pk"))
        .limit(candidateCap(batch))
        .collect() // bounded: <= 8*batch vocabulary-metadata rows
        .map { r =>
          val (a, b) = unpackPair(r.getLong(0)); (a, b, r.getLong(1))
        }.toSeq
      val selected = selectDisjoint(cands, math.min(batch, totalMerges - done))
      if (selected.isEmpty) exhausted = true
      else {
        val merges = selected.zipWithIndex.map { case ((a, b, c), i) =>
          out += ((done + i, a, b, c, Mod + done + i))
          (a, b, Mod + done + i)
        }
        done += selected.length
        if (done < totalMerges) {
          val (next, nextIds) = checkpointWithIds(
            seqs.as[Array[Long]].mapPartitions { it =>
              it.map { s0 =>
                var s = s0
                merges.foreach { case (a, b, m) => s = scalarMerge(s, a, b, m) }
                s
              }.filter(_.length >= 2)
            }.toDF("seq"))
          release(seqIds)
          seqs = next
          seqIds = nextIds
        }
      }
    }
    release(seqIds)
    out.toSeq
      .toDF("merge_round", "sym_a", "sym_b", "pair_count", "merged_sym")
      .orderBy(col("merge_round"))
  }

  /** Single-threaded replay of [[bpeMergesBatched]] — same pair
    * counting, same capped total-order candidate list, same greedy
    * disjoint selection, same batch rewrite — for oracle generation and
    * first-principles specs. */
  private[graft] def bpeMergesBatchedReplay(texts: Seq[String],
      totalMerges: Int, batch: Int = 64): Seq[(Int, Long, Long, Long, Long)] = {
    var seqs: Seq[Array[Long]] =
      texts.map(scalarTokenHashes).filter(_.length >= 2)
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    var done = 0
    var exhausted = false
    while (done < totalMerges && !exhausted) {
      val counts = new scala.collection.mutable.HashMap[(Long, Long), Long]()
      seqs.foreach { s =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
          i += 1
        }
      }
      val cands = counts.toSeq.map { case ((a, b), n) => (a, b, n) }
        .sortBy { case (a, b, n) => (-n, a, b) }
        .take(candidateCap(batch))
      val selected = selectDisjoint(cands, math.min(batch, totalMerges - done))
      if (selected.isEmpty) exhausted = true
      else {
        val merges = selected.zipWithIndex.map { case ((a, b, c), i) =>
          out += ((done + i, a, b, c, Mod + done + i))
          (a, b, Mod + done + i)
        }
        done += selected.length
        if (done < totalMerges)
          seqs = seqs.map { s0 =>
            var s = s0
            merges.foreach { case (a, b, m) => s = scalarMerge(s, a, b, m) }
            s
          }.filter(_.length >= 2)
      }
    }
    out.toSeq
  }

  /** Pure-Scala scalar twin of [[TextAnalysis.tokenHashes]]: per token,
    * fold (acc * 31 + char) mod 1e9+7 over the code points, acc0 = 7. */
  private[ops] def scalarTokenHashes(text: String): Array[Long] =
    text.split(" ", -1).map { t =>
      var acc = 7L
      var i = 0
      while (i < t.length) { acc = (acc * 31 + t.charAt(i)) % Mod; i += 1 }
      acc
    }

  /** Scalar greedy left-to-right merge of (a, b) -> m — the reference
    * semantics both distributed rewrite paths must match. */
  private[ops] def scalarMerge(s: Array[Long], a: Long, b: Long,
      m: Long): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += m; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** Single-threaded replay of [[bpeMerges]] for oracle generation and
    * first-principles specs: same pair counting, same (count desc,
    * a asc, b asc) arg-max, same greedy left-to-right merge. */
  private[graft] def bpeMergesReplay(texts: Seq[String],
      rounds: Int): Seq[(Int, Long, Long, Long, Long)] = {
    var seqs: Seq[Array[Long]] =
      texts.map(scalarTokenHashes).filter(_.length >= 2)
    (0 until rounds).map { r =>
      val counts = new scala.collection.mutable.HashMap[(Long, Long), Long]()
      seqs.foreach { s =>
        var i = 0
        while (i + 1 < s.length) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + 1L)
          i += 1
        }
      }
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      val m = Mod + r
      if (r < rounds - 1)
        seqs = seqs.map(scalarMerge(_, a, b, m)).filter(_.length >= 2)
      (r, a, b, c, m)
    }
  }

  /** Replay twin of train + [[applyMerges]] + per-key aggregation, for
    * verify-time oracle generation: (key, n_docs, toks_before,
    * toks_after, merged_occurrences) per key, keys ascending. */
  private[graft] def tokenizeSummaryReplay(rows: Seq[(String, String)],
      rounds: Int): Seq[(String, Long, Long, Long, Long)] = {
    val merges = bpeMergesReplay(rows.map(_._2), rounds)
      .map(t => (t._2, t._3, t._5))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (key, docs) =>
      var nd = 0L; var before = 0L; var after = 0L; var merged = 0L
      docs.foreach { case (_, text) =>
        val base = scalarTokenHashes(text)
        var s = base
        merges.foreach { case (a, b, m) => s = scalarMerge(s, a, b, m) }
        nd += 1; before += base.length; after += s.length
        merged += s.count(_ >= Mod)
      }
      (key, nd, before, after, merged)
    }
  }

  /** Tokenize the corpus under a trained merge list — the APPLY side of
    * BPE: every document's token-hash sequence runs the ordered merges
    * and reports (n_tokens, n_after, n_merged). A zero-shuffle typed
    * map stage: the k merges are closure constants (bounded — a merge
    * table is vocabulary metadata, the one thing that SHOULD live on
    * every executor), texts never move, and the per-row scalar kernel
    * is the SAME [[scalarMerge]] the trainer replay and oracle use —
    * not a reimplementation. */
  def applyMerges(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      merges: Seq[(Long, Long, Long)], textCol: String = "text",
      keyCol: String = "source"): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col(keyCol).cast("string"), col(textCol))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, key, text) =>
          val base = scalarTokenHashes(text)
          var s = base
          merges.foreach { case (a, b, m) => s = scalarMerge(s, a, b, m) }
          (id, key, base.length.toLong, s.length.toLong,
            s.count(_ >= Mod).toLong)
        }
      }
      .toDF("doc_id", keyCol, "n_tokens", "n_after", "n_merged")
  }
}

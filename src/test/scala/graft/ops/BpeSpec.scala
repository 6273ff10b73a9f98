package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-verified merges: pair counts, greedy rewrite, merged symbols") {
    // "x y x y x y": adjacent pairs (x,y)x3, (y,x)x2 -> round 0 merges
    // (x,y) with count 3; rewritten [M,M,M] has (M,M)x2 -> round 1 count 2
    val docs = Seq("x y x y x y").toDF("text")
    val out = Bpe.bpeMerges(docs, rounds = 2).collect()
    val hx = Bpe.scalarTokenHashes("x").head
    val hy = Bpe.scalarTokenHashes("y").head
    assert(out.length == 2)
    assert(out(0).getAs[Long]("sym_a") == hx)
    assert(out(0).getAs[Long]("sym_b") == hy)
    assert(out(0).getAs[Long]("pair_count") == 3L)
    assert(out(0).getAs[Long]("merged_sym") == Bpe.Mod)
    assert(out(1).getAs[Long]("sym_a") == Bpe.Mod)
    assert(out(1).getAs[Long]("sym_b") == Bpe.Mod)
    assert(out(1).getAs[Long]("pair_count") == 2L)
  }

  test("greedy left-to-right non-overlap: 'a a a' merges once per scan") {
    // (a,a) appears twice in "a a a" but greedy non-overlapping rewrite
    // yields [M, a]; the next round must see (M,a), not (M,M)
    val docs = Seq("a a a", "a a a").toDF("text")
    val out = Bpe.bpeMerges(docs, rounds = 2).collect()
    val ha = Bpe.scalarTokenHashes("a").head
    assert(out(0).getAs[Long]("sym_a") == ha &&
      out(0).getAs[Long]("sym_b") == ha)
    assert(out(0).getAs[Long]("pair_count") == 4L) // 2 per doc, 2 docs
    assert(out(1).getAs[Long]("sym_a") == Bpe.Mod)
    assert(out(1).getAs[Long]("sym_b") == ha)
    assert(out(1).getAs[Long]("pair_count") == 2L)
  }

  test("position-wise rewrite handles boundary and chained matches") {
    // distinct-pair path: "x y x y" merges BOTH occurrences in round 0
    // (non-overlap is structural), "y x y" keeps the leading y, and a
    // whole-sequence merge shrinks below 2 symbols and leaves the corpus
    val docs = Seq("x y x y", "y x y", "x y").toDF("text")
    val out = Bpe.bpeMerges(docs, rounds = 2).collect()
    val replay = Bpe.bpeMergesReplay(Seq("x y x y", "y x y", "x y"), 2)
    assert(out.map(r => (r.getAs[Int]("merge_round"), r.getAs[Long]("sym_a"),
      r.getAs[Long]("sym_b"), r.getAs[Long]("pair_count"),
      r.getAs[Long]("merged_sym"))).toSeq == replay)
    assert(out(0).getAs[Long]("pair_count") == 4L) // (x,y) x2 + x1 + x1
  }

  test("distributed merges are bit-identical to the single-threaded replay") {
    val docs = Tables.documents(spark, sfDir)
    val dist = Bpe.bpeMerges(docs, rounds = 4).collect()
      .map(r => (r.getAs[Int]("merge_round"), r.getAs[Long]("sym_a"),
        r.getAs[Long]("sym_b"), r.getAs[Long]("pair_count"),
        r.getAs[Long]("merged_sym"))).toSeq
    val texts = docs.select(col("text")).as[String].collect().toIndexedSeq
    assert(dist == Bpe.bpeMergesReplay(texts, 4))
  }

  test("result is stable under re-sharding (arg-max total order)") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val a = Bpe.bpeMerges(docs, rounds = 3).collect().map(_.toSeq).toSeq
    val b = Bpe.bpeMerges(docs.repartition(7), rounds = 3).collect()
      .map(_.toSeq).toSeq
    assert(a == b)
  }

  test("applyMerges matches the scalar tokenize replay per document") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.bpeMerges(docs, rounds = 3).collect()
      .map(r => (r.getAs[Long]("sym_a"), r.getAs[Long]("sym_b"),
        r.getAs[Long]("merged_sym"))).toIndexedSeq
    val dist = Bpe.applyMerges(spark, docs, merges)
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("n_tokens")).as("b"),
        org.apache.spark.sql.functions.sum(col("n_after")).as("a"),
        org.apache.spark.sql.functions.sum(col("n_merged")).as("m"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("b"), r.getAs[Long]("a"), r.getAs[Long]("m")))
      .sortBy(_._1).toSeq
    val rows = docs.select(col("source"), col("text"))
      .as[(String, String)].collect()
    assert(dist == Bpe.tokenizeSummaryReplay(rows.toIndexedSeq, 3))
    // merges must actually fire: some tokens collapsed somewhere
    assert(dist.map(_._4).sum < dist.map(_._3).sum)
  }

  test("batched trainer with batch=1 is bit-identical to the sequential " +
      "trainer") {
    // with one pair per round the disjointness constraint is vacuous and
    // the batched loop must reduce exactly to bpeMerges
    val docs = Tables.documents(spark, sfDir).limit(100)
    val seq = Bpe.bpeMerges(docs, rounds = 5).collect().map(_.toSeq).toSeq
    val bat = Bpe.bpeMergesBatched(docs, totalMerges = 5, batch = 1)
      .collect().map(_.toSeq).toSeq
    assert(bat == seq)
  }

  test("batched distributed merges are bit-identical to the batched replay") {
    val docs = Tables.documents(spark, sfDir).limit(150)
    val dist = Bpe.bpeMergesBatched(docs, totalMerges = 48, batch = 16)
      .collect()
      .map(r => (r.getAs[Int]("merge_round"), r.getAs[Long]("sym_a"),
        r.getAs[Long]("sym_b"), r.getAs[Long]("pair_count"),
        r.getAs[Long]("merged_sym"))).toSeq
    val texts = docs.select(col("text")).as[String].collect().toIndexedSeq
    val replay = Bpe.bpeMergesBatchedReplay(texts, 48, 16)
    assert(dist == replay)
    // the batch actually fired: 48 merges in 3 waves
    assert(dist.length == 48)
    assert(dist.map(_._5) == (0 until 48).map(Bpe.Mod + _))
  }

  test("within-round selections are pairwise-disjoint and counts are " +
      "batch-start-exact") {
    // selectDisjoint: top candidate always taken, symbol reuse skipped
    val cands = Seq((1L, 2L, 100L), (2L, 3L, 90L), (4L, 4L, 80L),
      (4L, 5L, 70L), (6L, 7L, 60L))
    val sel = Bpe.selectDisjoint(cands, 3)
    assert(sel == Seq((1L, 2L, 100L), (4L, 4L, 80L), (6L, 7L, 60L)))
    // disjoint merges don't disturb each other's counts: "a b c d" has
    // (a,b) and (c,d) both once; a 1-round batch of 2 must report both
    // at their corpus counts and the next round must see (M0, M1)
    val docs = Seq("a b c d", "a b c d", "c d q q").toDF("text")
    val out = Bpe.bpeMergesBatched(docs, totalMerges = 3, batch = 2)
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("pair_count") == 3L) // (c,d): 3 occurrences
    assert(out(1).getAs[Long]("pair_count") == 2L) // (a,b): 2 occurrences
    // round 2: rewritten corpus is [M1 M0, M1 M0, M0 q q] -> (M1,M0) x2
    assert(out(2).getAs[Long]("sym_a") == Bpe.Mod + 1 &&
      out(2).getAs[Long]("sym_b") == Bpe.Mod &&
      out(2).getAs[Long]("pair_count") == 2L)
  }

  test("batched trainer stops early when the corpus runs out of pairs") {
    val docs = Seq("x y", "x y").toDF("text")
    // round 0 merges (x,y) everywhere; every sequence drops below 2
    // symbols, so the corpus is exhausted after exactly 1 merge
    val out = Bpe.bpeMergesBatched(docs, totalMerges = 10, batch = 4)
      .collect()
    assert(out.length == 1)
    assert(Bpe.bpeMergesBatchedReplay(Seq("x y", "x y"), 10, 4).length == 1)
  }

  test("no persisted blocks survive the call (checkpoint release)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Bpe.bpeMerges(Tables.documents(spark, sfDir).limit(50),
      rounds = 2)
    out.count()
    // per-round sequence checkpoints must be released; only the 1-row
    // merge results may remain (they ARE the output)
    val leaked = (spark.sparkContext.getPersistentRDDs.keySet -- before)
      .flatMap(spark.sparkContext.getPersistentRDDs.get)
      .filter(_.partitions.length > 1)
    assert(leaked.isEmpty, s"corpus-sized blocks leaked: $leaked")
  }

  test("packed pair key is exact at the symbol-space boundary and " +
      "orders identically to (sym_a, sym_b)") {
    // the round-15 pair-count key packs sym_a << 31 | sym_b; both
    // symbols top out at MOD + 65535 (the merge-id ceiling), which must
    // fit 31 bits, and packed ASC must equal (sym_a ASC, sym_b ASC) —
    // the trainer's tie-break order
    val top = Bpe.Mod + 65535L
    assert(top < (1L << 31), "symbol space outgrew the 31-bit packing")
    val syms = Seq(0L, 1L, Bpe.Mod - 1, Bpe.Mod, top)
    val pairs = for (a <- syms; b <- syms) yield (a, b)
    pairs.foreach { case (a, b) =>
      val packed = (a << 31) | b
      assert(Bpe.unpackPair(packed) == ((a, b)), s"pack/unpack lost ($a,$b)")
    }
    val byPair = pairs.sorted
    val byPacked = pairs.sortBy { case (a, b) => (a << 31) | b }
    assert(byPair == byPacked, "packed order diverged from pair order")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("ngrams produces distinct sliding word windows") {
    val df = Seq("a b c d a b c d").toDF("text")
    val grams = df.select(TextAnalysis.ngrams($"text", 3).as("g"))
      .head().getSeq[String](0)
    assert(grams.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("ngrams of short text is empty, 1-gram equals distinct tokens") {
    val df = Seq("x y").toDF("text")
    assert(df.select(TextAnalysis.ngrams($"text", 3)).head().getSeq[String](0).isEmpty)
    assert(df.select(TextAnalysis.ngrams($"text", 1)).head().getSeq[String](0).toSet
      == Set("x", "y"))
  }

  test("jaccard truth table") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(TextAnalysis.jaccard($"x", $"y")).head().getDouble(0) == 0.5)
  }

  test("langId picks the language with most stopword hits") {
    val cases = Seq(
      "the cat and a dog of mine",      // en
      "der hund ist nicht die katze",   // de
      "el que y los otros una vez",     // es
      "le chat est dans les arbres",    // fr
      "nothing matching here xyz")      // und
    val out = cases.toDF("text")
      .select(TextAnalysis.langIdPredicted($"text")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "es", "fr", "und"))
  }

  test("fingerprint is stable, content-sensitive, and in mod range") {
    val df = Seq("hello world", "hello world", "hello worlD").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    assert(fps.forall(f => f >= 0 && f < 1000000007L))
  }

  test("native token/ngram hash kernels match the HOF reference exactly") {
    // whitespace edge cases: leading/trailing/double spaces (empty tokens
    // hash via one ascii('')=0 fold step), empty string, short docs
    val edge = Seq(" a b", "a b ", "a  b", "", "x", "a b c d e").toDF("text")
    val corpus = graft.Tables.documents(spark, sfDir).select($"text")
    for (df <- Seq(edge, corpus)) {
      val cmp = df.select(
        TextAnalysis.tokenHashes($"text").as("nat_th"),
        TextAnalysis.tokenHashesHof($"text").as("hof_th"),
        TextAnalysis.hashedNgrams($"text", 3).as("nat_g"),
        TextAnalysis.hashedNgramsHof($"text", 3).as("hof_g"))
        .collect()
      cmp.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"token hashes: $r")
        assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"ngram hashes: $r")
      }
    }
  }

  test("fuzz: native kernels match HOF reference on 300 random strings") {
    // fixed-seed generator over printable ASCII with space pathologies
    val rnd = new scala.util.Random(1234)
    val alphabet = ('a' to 'z') ++ ('0' to '9') ++ "  .,;:!?'\"-" // spaces x2
    val cases = Seq("", " ", "  ", " a ", "a  b") ++ (0 until 300).map { _ =>
      val len = rnd.nextInt(120)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = cases.toDF("text")
    val cmp = df.select(
      TextAnalysis.tokenHashes($"text").as("nat_th"),
      TextAnalysis.tokenHashesHof($"text").as("hof_th"),
      TextAnalysis.hashedNgrams($"text", 2).as("nat_g2"),
      TextAnalysis.hashedNgramsHof($"text", 2).as("hof_g2"),
      Dedup.minHashSignature(TextAnalysis.hashedNgrams($"text", 2), 16).as("nat_mh"),
      Dedup.minHashSignatureHof(TextAnalysis.hashedNgramsHof($"text", 2), 16).as("hof_mh"),
      Dedup.simHashSig($"text", 16).as("nat_sh"),
      Dedup.simHashSigHof($"text", 16).as("hof_sh"),
      $"text").collect()
    cmp.foreach { r =>
      val t = r.getString(8)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"tokenHashes on '$t'")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"hashedNgrams on '$t'")
      assert(r.getSeq[Long](4) == r.getSeq[Long](5), s"minHashSig on '$t'")
      assert(r.getSeq[Long](6) == r.getSeq[Long](7), s"simHashSig on '$t'")
    }
  }

  test("quality features on a known string") {
    val df = Seq((7L, "ab cd ef")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df).head()
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(r.getAs[Double]("avg_token_len") == 2.0)
    assert(r.getAs[Double]("alpha_ratio") == 0.75) // 6 of 8 chars a-z
  }

  test("repetition features flag degenerate docs, pass normal ones") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // top bigram 'spam spam' x3 of 3
      (2L, "a b c d e f g h"),              // all bigrams unique
      (3L, "one"),                          // no bigrams at all
      (4L, "x y x y x y x y z")             // 'x y' 4 of 8 = 0.5
    ).toDF("doc_id", "text")
    val rs = TextAnalysis.repetitionFeatures(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).getAs[Long]("top_bigram_n") == 3L)
    assert(rs(1L).getAs[Double]("frac_top_bigram") == 1.0)
    assert(rs(1L).getAs[Int]("flagged") == 1)
    assert(rs(2L).getAs[Long]("top_bigram_n") == 1L)
    assert(rs(2L).getAs[Int]("flagged") == 0)
    assert(rs(3L).getAs[Long]("top_bigram_n") == 0L)
    assert(rs(3L).isNullAt(rs(3L).fieldIndex("frac_top_bigram")))
    assert(rs(3L).getAs[Int]("flagged") == 0)
    assert(rs(4L).getAs[Double]("frac_top_bigram") == 0.5)
    assert(rs(4L).getAs[Int]("flagged") == 1)
    assert(rs(4L).getAs[Double]("dup_token_frac") ==
      math.rint((1.0 - 3.0 / 9.0) * 1e6) / 1e6)
  }

  test("per-row top-bigram fold matches the explode+groupBy formulation") {
    val docs = graft.Tables.documents(spark, sfDir)
    val fold = docs.select($"doc_id",
        TextAnalysis.topBigramCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = split($"text", " ")
    val grouped = docs.select($"doc_id",
        explode(zip_with(slice(w, lit(1), greatest(size(w) - 1, lit(0))),
          slice(w, lit(2), greatest(size(w) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy($"doc_id", $"bg").count()
      .groupBy($"doc_id").agg(max($"count").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    grouped.foreach { case (id, mx) =>
      assert(fold(id) == mx, s"doc $id: fold=${fold(id)} grouped=$mx")
    }
  }

  test("boilerplateScrub removes every token covered by a frequent n-gram") {
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "d e f x y z"),
      (3L, "g h i x y z"),
      (4L, "j k l m n o")
    ).toDF("doc_id", "text")
    // 'x y z' is in 3/4 docs > 0.5; every other 3-gram is unique.
    val rs = TextAnalysis.boilerplateScrub(docs, n = 3, maxDocFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq(1L -> "a b c", 2L -> "d e f", 3L -> "g h i").foreach { case (id, kept) =>
      assert(rs(id).getAs[Int]("n_flagged") == 1)
      assert(rs(id).getAs[Int]("n_tokens_kept") == 3)
      assert(rs(id).getAs[String]("text_scrubbed") == kept)
    }
    assert(rs(4L).getAs[Int]("n_flagged") == 0)
    assert(rs(4L).getAs[String]("text_scrubbed") == "j k l m n o")
  }

  test("boilerplateScrub merges overlapping flagged spans") {
    // 'p q' is in all 3 docs; in doc 1 its two occurrences overlap at q
    // (p q p q) so the covered region is tokens 1..4, keeping 'r s'.
    val docs = Seq(
      (1L, "p q p q r s"),
      (2L, "p q a b c d"),
      (3L, "p q e f g h")
    ).toDF("doc_id", "text")
    val rs = TextAnalysis.boilerplateScrub(docs, n = 2, maxDocFrac = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rs(1L).getAs[Int]("n_flagged") == 2)
    assert(rs(1L).getAs[String]("text_scrubbed") == "r s")
    assert(rs(2L).getAs[String]("text_scrubbed") == "a b c d")
  }

  test("chunkByTokens covers every token with the promised overlap") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
                   (2L, "a b c")).toDF("doc_id", "text")
    val rs = TextAnalysis.chunkByTokens(docs, budget = 4, overlap = 1)
      .orderBy($"doc_id", $"chunk_id").collect()
    val d1 = rs.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[Int]("start")).toSeq == Seq(1, 4, 7))
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    val d2 = rs.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getAs[String]("chunk_text") == "a b c")
    // generic coverage property on real data: concatenating each chunk's
    // non-overlapped suffix reconstructs the document exactly
    val real = graft.Tables.documents(spark, sfDir).limit(50)
    val chunks = TextAnalysis.chunkByTokens(real, budget = 48, overlap = 8)
      .orderBy($"doc_id", $"chunk_id")
      .groupBy($"doc_id").agg(
        concat_ws(" ", collect_list(when($"chunk_id" === 0, $"chunk_text")
          .otherwise(array_join(slice(split($"chunk_text", " "), 9, 48), " "))))
          .as("rebuilt"))
    val joined = real.join(chunks, "doc_id")
      .filter($"text" =!= $"rebuilt").count()
    assert(joined == 0, "chunk reassembly must reproduce every document")
  }

  test("tfidfTopTerms ranks by linear idf with token tiebreak") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")
    ).toDF("doc_id", "text")
    val rs = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .orderBy($"doc_id", $"rank").collect()
    // d1: apple tf2*2/df1=4, banana tf1*2/df2=1; d2: cherry 2, banana 1
    assert(rs.map(r => (r.getLong(0), r.getString(1), r.getDouble(4))).toSeq ==
      Seq((1L, "apple", 4.0), (1L, "banana", 1.0),
          (2L, "cherry", 2.0), (2L, "banana", 1.0)))
  }

  test("ngramOccurrences keeps duplicates in order; ngrams is its distinct") {
    val df = Seq("a b a b a").toDF("text")
    val occ = df.select(TextAnalysis.ngramOccurrences($"text", 2).as("g"))
      .head().getSeq[String](0)
    assert(occ == Seq("a b", "b a", "a b", "b a"))
    val dis = df.select(TextAnalysis.ngrams($"text", 2)).head().getSeq[String](0)
    assert(dis.toSet == occ.toSet && dis.length == 2)
  }

  test("bigramCoverage truth table on a handcrafted corpus") {
    val docs = Seq(
      (1L, "the cat sat"),       // bigrams: "the cat", "cat sat"
      (2L, "the cat ran"),       // bigrams: "the cat", "cat ran"
      (3L, "zq zq zq"),          // bigrams: "zq zq" x2 (df 1 — uncovered)
      (4L, "solo")               // no bigram -> absent from output
    ).toDF("doc_id", "text")
    val rs = TextAnalysis.bigramCoverage(docs, minDf = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    // doc1: occurrences 2, distinct 2; "the cat" df=2 covered, "cat sat"
    // df=1 not -> coverage 0.5; mean_df = (2+1)/2 = 1.5
    // doc3: "zq zq" occ 2, df 1 -> coverage 0, mean_df 1
    assert(rs.toSeq == Seq(
      (1L, 2L, 2L, 1L, 0.5, 1.5),
      (2L, 2L, 2L, 1L, 0.5, 1.5),
      (3L, 2L, 1L, 0L, 0.0, 1.0)))
  }

  test("bigramCoverage of a corpus of identical docs is fully covered") {
    val docs = (1L to 5L).map(i => (i, "all docs look alike here"))
      .toDF("doc_id", "text")
    val rs = TextAnalysis.bigramCoverage(docs, minDf = 2).collect()
    assert(rs.length == 5)
    assert(rs.forall(_.getDouble(4) == 1.0), "every bigram has df=5 >= 2")
    assert(rs.forall(_.getDouble(5) == 5.0), "mean_df must be the doc count")
  }

  test("bigramLmScore matches hand-computed Laplace probabilities") {
    import spark.implicits._
    // corpus: "a b", "a b", "a c". c(a b)=2, c(a c)=1, context c(a)=3,
    // vocab V={a,b,c}=3. p(b|a)=(2+1)*1e6 div (3+3)=500000;
    // p(c|a)=(1+1)*1e6 div 6=333333.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val rs = TextAnalysis.bigramLmScore(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rs.toSeq == Seq(
      (1L, 1L, 500000L, 500000L),
      (2L, 1L, 500000L, 500000L),
      (3L, 1L, 333333L, 333333L)))
  }

  test("bigramLmScore: in-distribution docs outscore noise; 1-token docs drop") {
    import spark.implicits._
    val docs = ((1L to 8L).map(i => (i, "the cat sat on the mat")) ++
      Seq((9L, "zq xv qqk lmw pf"), (10L, "solo")))
      .toDF("doc_id", "text")
    val rs = TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("avg_ppm")).toMap
    assert(!rs.contains(10L), "a single-token doc has no bigram")
    assert(rs(1L) > rs(9L),
      s"corpus-typical doc must outscore noise: ${rs(1L)} vs ${rs(9L)}")
  }
}

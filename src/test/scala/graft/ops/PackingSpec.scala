package graft.ops

import graft.{SparkSpec, Tables}

/** Invariants of greedy sequence packing, plus determinism across
  * parallelism (the property that matters when the cluster re-shards). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 512

  test("distributed packing equals a sequential local replay") {
    val rows = Packing.packBySource(Tables.documents(spark, sfDir), budget)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.source, r.pack_id)).foreach { case ((s, p), ds) =>
      val tot = ds.map(_.n_tokens.toLong).sum
      assert(tot <= budget || ds.length == 1,
        s"pack ($s,$p) holds $tot tokens in ${ds.length} docs")
    }
    rows.groupBy(_.source).foreach { case (s, ds) =>
      var fill = 0L; var bin = 0L; var first = true
      ds.sortBy(_.doc_id).foreach { d =>
        if (first) { fill = d.n_tokens.toLong; first = false }
        else if (fill + d.n_tokens > budget) { bin += 1; fill = d.n_tokens.toLong }
        else fill += d.n_tokens
        assert(d.pack_id == bin,
          s"doc ${d.doc_id} of $s: pack ${d.pack_id}, replay says $bin")
      }
    }
  }

  test("packing is deterministic across parallelism levels") {
    val docs = Tables.documents(spark, sfDir)
    val a = Packing.packBySource(docs, budget)
      .collect().map(d => d.doc_id -> d.pack_id).toMap
    val b = Packing.packBySource(docs.repartition(7), budget)
      .collect().map(d => d.doc_id -> d.pack_id).toMap
    assert(a == b, "pack assignment changed with input partitioning")
  }

  test("packing an empty corpus yields an empty result") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
    assert(Packing.packBySource(empty).collect().isEmpty)
  }

  test("sharded packing: streams split at fixed doc_id boundaries only") {
    val docs = Tables.documents(spark, sfDir)
    val sharded = Packing.packBySource(docs, budget, shardDocs = Some(100L))
      .collect()
    // within a shard, assignment equals the unsharded greedy fold applied
    // to that shard's documents alone, namespaced by shard*shardDocs
    sharded.groupBy(d => (d.source, d.doc_id / 100)).foreach {
      case ((s, sh), ds) =>
        var fill = 0L; var bin = 0L; var first = true
        ds.sortBy(_.doc_id).foreach { d =>
          if (first) { fill = d.n_tokens.toLong; first = false }
          else if (fill + d.n_tokens > budget) { bin += 1; fill = d.n_tokens.toLong }
          else fill += d.n_tokens
          assert(d.pack_id == sh * 100 + bin,
            s"doc ${d.doc_id} of ($s,$sh): pack ${d.pack_id}, replay ${sh * 100 + bin}")
        }
    }
    // a shard spanning the whole id range degenerates to the unsharded path
    val wide = Packing.packBySource(docs, budget,
        shardDocs = Some(Long.MaxValue))
      .collect().map(d => d.doc_id -> d.pack_id).toMap
    val unsharded = Packing.packBySource(docs, budget)
      .collect().map(d => d.doc_id -> d.pack_id).toMap
    assert(wide == unsharded,
      "a single covering shard must reproduce unsharded assignment")
    // and the sharded assignment is itself parallelism-independent
    val again = Packing.packBySource(docs.repartition(7), budget,
        shardDocs = Some(100L))
      .collect().map(d => d.doc_id -> d.pack_id).toMap
    assert(again == sharded.map(d => d.doc_id -> d.pack_id).toMap,
      "sharded assignment changed with input partitioning")
  }

  test("planted packing truth table") {
    val docs = Seq(
      (1L, "a " * 299 + "a", "s"),   // 300 tokens -> pack 0 (fill 300)
      (2L, "b " * 199 + "b", "s"),   // 200 -> fits, pack 0 (fill 500)
      (3L, "c " * 99 + "c", "s"),    // 100 -> overflow, pack 1
      (4L, "d " * 599 + "d", "s"),   // 600 oversized -> pack 2 alone
      (5L, "e", "s"),                // 1 -> fill 600+1 > 512 -> pack 3
      (6L, "f", "t")                 // separate source restarts at 0
    ).toDF("doc_id", "text", "source")
    val got = Packing.packBySource(docs, budget).collect()
      .map(d => d.doc_id -> d.pack_id).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      6L -> 0L), s"got $got")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The registry's own contract — writer serialization, guard-path type
  * semantics, stale-lock refusal. The store-integration legs (blocks
  * every ingest verb, survives rebuilds, the one-call execute) live in
  * DedupIndexSpec / VectorStoreSpec / AssemblySpec and the TextSuite
  * audit queries. */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(dir: String) =
    graft.wri.WriFs.fs(dir, spark.sparkContext.hadoopConfiguration)

  test("concurrent registrations serialize: no caller's ids are " +
      "silently dropped by a read-modify-write race") {
    val d = tmp("takedown_race")
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        Takedown.register(spark, d,
          Seq(100L * i, 100L * i + 1).toDF("doc_id"), "doc_id")
        ()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    val expected = (0 until 8)
      .flatMap(i => Seq(100L * i, 100L * i + 1)).toSet
    assert(Takedown.registered(fsOf(d), d) == expected,
      "a concurrent registration lost ids — the lock did not serialize")
  }

  test("a register racing an unregister never corrupts the registry: " +
      "the survivor set is one of the two serial orders") {
    val d = tmp("takedown_regunreg")
    Takedown.register(spark, d, Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id")
    val t1 = new Thread(() => {
      Takedown.register(spark, d, Seq(9L).toDF("doc_id"), "doc_id"); ()
    })
    val t2 = new Thread(() => {
      Takedown.unregister(spark, d, Seq(2L).toDF("doc_id"), "doc_id"); ()
    })
    t1.start(); t2.start(); t1.join(60000); t2.join(60000)
    val got = Takedown.registered(fsOf(d), d)
    assert(got == Set(1L, 3L, 9L),
      s"serialized outcome must hold both writers' effects: $got")
  }

  test("a crashed writer's stale lock turns mutation into a LOUD " +
      "failure with remediation, never a silent drop") {
    val d = tmp("takedown_stale")
    val fs = fsOf(d)
    fs.create(new Path(s"$d/_takedowns.lock"), false).close()
    sys.props("graft.takedown.lockWaitMs") = "300"
    try {
      val e = intercept[IllegalStateException] {
        Takedown.register(spark, d, Seq(5L).toDF("doc_id"), "doc_id")
      }
      assert(e.getMessage.contains("_takedowns.lock") &&
        e.getMessage.contains("delete the lock"),
        s"stale-lock error must say what to do: ${e.getMessage}")
    } finally sys.props -= "graft.takedown.lockWaitMs"
    // after the operator clears the lock the mutation lands
    fs.delete(new Path(s"$d/_takedowns.lock"), false)
    assert(Takedown.register(spark, d,
      Seq(5L).toDF("doc_id"), "doc_id") == Set(5L))
  }

  test("registry drift across stores is detected and healable: a " +
      "takedown that missed a store surfaces per-gap, align registers " +
      "the union everywhere, and an asymmetric unregister re-surfaces " +
      "as drift (the appeal path is explicit, never a heal side effect)") {
    import org.apache.spark.sql.functions.col
    val stores = Seq("a", "b", "c").map(n => n -> tmp(s"takedown_$n"))
    val ids = Seq(1L, 2L).toDF("doc_id")
    stores.foreach { case (_, d) =>
      Takedown.register(spark, d, ids, "doc_id")
    }
    assert(Takedown.auditRegistries(spark, stores).isEmpty,
      "aligned registries reported drift")
    // a hand takedown that reached only store a
    Takedown.register(spark, stores.head._2, Seq(9L).toDF("doc_id"),
      "doc_id")
    val drift = Takedown.auditRegistries(spark, stores).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(drift == Set((9L, "b"), (9L, "c")), s"drift was $drift")
    assert(Takedown.alignRegistries(spark, stores) == Set(1L, 2L, 9L))
    assert(Takedown.auditRegistries(spark, stores).isEmpty,
      "align did not close the gaps")
    // an appeal granted on ONE store only is drift too — and align
    // RE-REGISTERS it (union semantics: unregistering everywhere is
    // the explicit appeal path, not a heal side effect)
    Takedown.unregister(spark, stores(1)._2, Seq(2L).toDF("doc_id"),
      "doc_id")
    val drift2 = Takedown.auditRegistries(spark, stores)
      .filter(col("id") === 2L).collect().map(_.getString(1)).toSeq
    assert(drift2 == Seq("b"), s"asymmetric unregister drift: $drift2")
    Takedown.alignRegistries(spark, stores)
    assert(Takedown.registered(fsOf(stores(1)._2), stores(1)._2)
      .contains(2L))
  }

  test("guard's IN-list path casts the id column like the other two " +
      "paths: a registered id behind a string-typed column is still " +
      "blocked, and a non-numeric id passes through like a null") {
    val d = tmp("takedown_cast")
    Takedown.register(spark, d, Seq(3L).toDF("doc_id"), "doc_id")
    val batch = Seq("3", "4", "oops", null.asInstanceOf[String])
      .toDF("doc_id")
    val kept = Takedown.guard(batch, "doc_id", None, fsOf(d), d)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("4", "oops", null),
      s"IN-list guard over a string id column kept: $kept")
    // same batch through the anti-join path (registry above the IN cap
    // is exercised structurally via a caller list here — the join arm)
    val keptJoin = Takedown.guard(batch, "doc_id",
      Some(Seq(4L).toDF("doc_id")), fsOf(d), d)
      .collect().map(_.getString(0)).toSet
    assert(keptJoin == Set("oops", null),
      s"caller-list arm disagreed with the IN-list arm: $keptJoin")
  }

  test("guard refuses a FRACTIONAL id column loudly — bigint truncation " +
      "would block 3.7 whenever 3 is registered, so the rounding " +
      "decision stays with the caller") {
    val d = tmp("takedown_frac")
    Takedown.register(spark, d, Seq(3L).toDF("doc_id"), "doc_id")
    val e = intercept[IllegalArgumentException] {
      Takedown.guard(Seq(3.7, 4.0).toDF("doc_id"), "doc_id", None,
        fsOf(d), d)
    }
    assert(e.getMessage.contains("integral by contract"), e.getMessage)
    // the sanctioned path: an explicit caller-side cast works
    val kept = Takedown.guard(
      Seq(3.7, 4.0).toDF("doc_id")
        .select(col("doc_id").cast("long").as("doc_id")),
      "doc_id", None, fsOf(d), d).collect().map(_.getLong(0)).toSet
    assert(kept == Set(4L), s"explicit-cast path kept $kept")
    // EVERY arm refuses, not just the batch column: a fractional
    // caller list would block the truncated ids (blocking 3 because
    // 3.7 was listed), and fractional register/unregister would
    // persist truncated ids into the standing registry
    val callerErr = intercept[IllegalArgumentException] {
      Takedown.guard(Seq(3L, 4L).toDF("doc_id"), "doc_id",
        Some(Seq(3.7).toDF("doc_id")), fsOf(d), d)
    }
    assert(callerErr.getMessage.contains("integral by contract"),
      callerErr.getMessage)
    val regErr = intercept[IllegalArgumentException] {
      Takedown.register(spark, d, Seq(3.7).toDF("doc_id"), "doc_id")
    }
    assert(regErr.getMessage.contains("integral by contract"),
      regErr.getMessage)
    val unregErr = intercept[IllegalArgumentException] {
      Takedown.unregister(spark, d, Seq(3.7f).toDF("doc_id"), "doc_id")
    }
    assert(unregErr.getMessage.contains("integral by contract"),
      unregErr.getMessage)
    assert(Takedown.registered(fsOf(d), d) == Set(3L),
      "a refused register/unregister mutated the registry")
  }

  test("guard's anti-join arms survive a batch that already carries a " +
      "__takedown_id-shaped column: the blocked-id side is aliased to " +
      "a generated name, so the join is never ambiguous") {
    val d = tmp("takedown_collide")
    Takedown.register(spark, d, Seq(3L).toDF("doc_id"), "doc_id")
    // the batch legitimately owns BOTH historically fixed names the
    // generator would try first — it must skip past them
    val batch = Seq((3L, "x", "y"), (4L, "x", "y"))
      .toDF("doc_id", "__takedown_id", "__takedown_id_0")
    val kept = Takedown.guard(batch, "doc_id",
      Some(Seq(4L).toDF("doc_id")), fsOf(d), d)
      .collect()
    assert(kept.isEmpty,
      s"3 is registered and 4 is caller-blocked; kept ${kept.length}")
    val kept2 = Takedown.guard(batch.filter(col("doc_id") =!= 3L),
      "doc_id", None, fsOf(d), d).collect()
    assert(kept2.length == 1 && kept2.head.getLong(0) == 4L &&
      kept2.head.schema.fieldNames.toSeq ==
        Seq("doc_id", "__takedown_id", "__takedown_id_0"),
      "the guarded batch must keep its own columns untouched")
  }
}

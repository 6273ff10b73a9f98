package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

/** A test [[org.apache.hadoop.fs.FileSystem]] with OBJECT-STORE rename
  * semantics over local disk: `rename` is a non-atomic copy THEN delete
  * (the s3a shape), and the only atomic primitive is a single-file
  * create-overwrite (a PUT). Registered under `objstub://`, it has no
  * AbstractFileSystem binding, so
  * [[graft.wri.WriFs.atomicWriteString]]'s FileContext path is
  * unavailable and the direct-PUT fallback must carry the pointer flip —
  * exactly the environment `pointerSwap = true` exists for. Every rename
  * is recorded so specs can assert the pointer-mode lifecycle never
  * renames a store component. */
class ObjStubFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "objstub"
  override def getUri: java.net.URI = java.net.URI.create("objstub:///")

  override def rename(src: Path, dst: Path): Boolean = {
    ObjStubFileSystem.record(src.toUri.getPath, dst.toUri.getPath)
    if (!exists(src)) return false
    // FileSystem rename contract: an existing directory target receives
    // the source as a child; an existing target otherwise fails
    val target =
      if (exists(dst) && getFileStatus(dst).isDirectory)
        new Path(dst, src.getName)
      else dst
    if (exists(target)) return false
    // the object-store shape: COPY (non-atomic, possibly many objects)
    // then DELETE — a reader can observe the half-copied target
    FileUtil.copy(this, src, this, target, true, getConf)
  }
}

object ObjStubFileSystem {
  private val renames =
    scala.collection.mutable.Buffer.empty[(String, String)]
  def record(src: String, dst: String): Unit =
    synchronized { renames += ((src, dst)); () }
  def recorded: Seq[(String, String)] = synchronized { renames.toSeq }
  def reset(): Unit = synchronized { renames.clear() }
}

/** The s3a caveat (VectorStore's pointer-mode docs) executed instead of
  * documented: the full compact/retrain pointer lifecycle runs on a
  * filesystem whose rename is copy+delete, results track a local-disk
  * twin bit-for-bit, and the store's own protocol is proven to never
  * rename a component — only parquet's task/job commits (which a real
  * deployment replaces with a cloud committer) rename, and only below
  * component roots. */
class ObjectStoreSemanticsSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration.set("fs.objstub.impl",
    classOf[ObjStubFileSystem].getName)

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private def queryVec: Array[Float] =
    emb.filter($"vec_id" === 0L).select($"embedding")
      .as[Array[Float]].head()
  private def topk(d: String): Seq[(Long, Double)] =
    VectorStore.queryTopK(spark, d, queryVec, k = 20, nprobe = 8,
        excludeVecId = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("pointer-swap vector-store lifecycle on copy+delete-rename " +
      "semantics: results track a local twin; no component is renamed") {
    ObjStubFileSystem.reset()
    val localRoot = java.nio.file.Files
      .createTempDirectory("objstub_store").toString
    val d = s"objstub://$localRoot"
    def run(dir: String): Unit = {
      VectorStore.write(spark, emb.filter($"vec_id" % 2 === 0), dir)
      VectorStore.append(spark, dir, emb.filter($"vec_id" % 2 === 1))
      VectorStore.delete(spark, dir,
        emb.filter($"vec_id" % 10 === 3).select($"vec_id"))
    }
    val twin = java.nio.file.Files
      .createTempDirectory("objstub_twin").toString
    run(d); run(twin)
    assert(topk(d) == topk(twin), "objstub store drifted before compact")
    VectorStore.compact(spark, d, pointerSwap = true)
    VectorStore.compact(spark, twin, pointerSwap = true)
    assert(topk(d) == topk(twin), "pointer-mode compact drifted")
    // the flip happened through the direct-PUT fallback (no FileContext
    // binding for objstub): _current resolves, base names are gone
    assert(new java.io.File(s"$localRoot/_current").exists() &&
      new java.io.File(s"$localRoot/codes@1").exists() &&
      !new java.io.File(s"$localRoot/codes").exists())
    VectorStore.retrain(spark, d, emb, pointerSwap = true)
    VectorStore.retrain(spark, twin, emb, pointerSwap = true)
    assert(topk(d) == topk(twin), "pointer-mode retrain drifted")
    // post-lifecycle ingest still lands and serves
    VectorStore.append(spark, d,
      emb.filter($"vec_id" === 3L))
    assert(VectorStore.queryTopK(spark, d, queryVec, k = 200, nprobe = 8)
      .filter($"vec_id" === 3L).count() == 1L)
    // the QA sweep resolves the pointer generation and runs clean on
    // object-store semantics — READ-ONLY, so an analyst session can
    // sweep without writing. The lake after this lifecycle: tombstoned
    // rows were consumed by the retrain, vec 3 was re-appended.
    assert(VectorStore.validate(spark, d,
        emb.filter($"vec_id" % 10 =!= 3 || $"vec_id" === 3L),
        readOnly = true)
      .filter(!$"ok").isEmpty,
      "pointer-mode store failed its QA sweep on objstub")
    // THE CLAIM: the store's own lifecycle never renamed a component —
    // every recorded rename on the store belongs to parquet's
    // task/job-commit machinery strictly BELOW component roots
    val componentRenames = ObjStubFileSystem.recorded.filter {
      case (src, dst) =>
        src.startsWith(localRoot) &&
          (new java.io.File(src).getParent == localRoot ||
            new java.io.File(dst).getParent == localRoot)
    }
    assert(componentRenames.isEmpty,
      s"pointer-mode lifecycle renamed store components: " +
        s"${componentRenames.take(5)}")
    assert(ObjStubFileSystem.recorded.nonEmpty,
      "stub recorded no renames at all — the tracking is inert")
  }

  test("shard-store lifecycle on copy+delete-rename semantics: the " +
      "_committed_vN exclusive-create commit and the exactly-once " +
      "append hold") {
    val localRoot = java.nio.file.Files
      .createTempDirectory("objstub_shards").toString
    val d = s"objstub://$localRoot"
    val toks = Tables.documents(spark, sfDir)
      .withColumn("tok", size(split($"text", " ")).cast("long"))
      .select($"doc_id", $"tok")
    Assembly.writeShards(toks.filter($"doc_id" % 3 === 0),
      "doc_id", "tok", 4000L, 42L, d)
    val b = toks.filter($"doc_id" % 3 === 1)
    val m1 = Assembly.appendShardsExactlyOnce(b, "doc_id", "tok", d)
      .collect().map(_.toSeq).toSet
    // committed re-delivery no-ops on the object-store filesystem too
    val m2 = Assembly.appendShardsExactlyOnce(b, "doc_id", "tok", d)
      .collect().map(_.toSeq).toSet
    assert(m2 == m1, "re-delivered batch was not a no-op on objstub")
    // QA sweep green, totals definitional
    assert(Assembly.validateShards(spark, d, "doc_id", "tok")
      .filter(!$"ok").isEmpty)
    val total = Assembly.readManifest(spark, d)
      .agg(org.apache.spark.sql.functions.sum($"n_docs")).head.getLong(0)
    assert(total ==
      toks.filter($"doc_id" % 3 === 0 || $"doc_id" % 3 === 1).count())
    // the takedown purge's sealed witness + versioned recommit ride the
    // same PUT-fallback protocol: purge on objstub, validate green, and
    // the purged ids are physically gone
    val victims = toks.filter($"doc_id" % 9 === 0).select($"doc_id")
    val nVictims = victims.count()
    Assembly.purgeDocs(spark, d, victims, "doc_id", "tok")
    assert(spark.read.parquet(s"$d/shards")
      .filter($"doc_id" % 9 === 0).isEmpty,
      "purged doc_ids still present on objstub")
    assert(Assembly.validateShards(spark, d, "doc_id", "tok")
      .filter(!$"ok").isEmpty,
      "post-purge objstub store fails its QA sweep")
    assert(Assembly.readManifest(spark, d)
      .agg(org.apache.spark.sql.functions.sum($"n_docs")).head.getLong(0)
      == total - nVictims)
  }

  test("dedup-index lifecycle on copy+delete-rename semantics: the " +
      "atomic _folded marker rides the PUT fallback") {
    val localRoot = java.nio.file.Files
      .createTempDirectory("objstub_didx").toString
    val d = s"objstub://$localRoot"
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(300)
    DedupIndex.write(spark, docs.filter($"doc_id" % 2 === 0), d)
    DedupIndex.ingest(spark, d, docs.filter($"doc_id" % 2 === 1),
      batchId = 1L)
    DedupIndex.delete(spark, d,
      docs.filter($"doc_id" % 5 === 0).select($"doc_id"), batchId = 0L)
    val probe = docs.limit(40)
      .select(($"doc_id" + 90000L).as("doc_id"), $"text")
    val before = DedupIndex.queryPairs(spark, d, probe).collect()
      .map(_.toSeq).toSet
    DedupIndex.compact(spark, d)
    assert(new java.io.File(s"$localRoot/_folded").exists())
    val after = DedupIndex.queryPairs(spark, d, probe).collect()
      .map(_.toSeq).toSet
    assert(after == before, "compact on objstub changed results")
  }

  test("the takedown registry rides the PUT fallback on object-store " +
      "semantics: register, idempotent re-register, and a guarded " +
      "ingest all work over objstub://") {
    val localRoot = java.nio.file.Files
      .createTempDirectory("objstub_reg").toString
    val d = s"objstub://$localRoot"
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(300)
    val blocked = docs.filter($"doc_id" % 7 === 3).select($"doc_id")
    DedupIndex.write(spark, docs.filter($"doc_id" % 2 === 0), d)
    val ids1 = Takedown.register(spark, d, blocked, "doc_id")
    assert(new java.io.File(s"$localRoot/_takedowns").exists(),
      "registry file did not land through the PUT fallback")
    assert(Takedown.register(spark, d, blocked, "doc_id") == ids1,
      "re-register over the PUT path changed the registry")
    // an ingest with NO caller takedown list: the registry alone bites
    DedupIndex.append(spark, d, docs.filter($"doc_id" % 2 === 1),
      batchId = 1L)
    assert(spark.read.parquet(s"$d/sigs/batch=1")
      .filter($"doc_id" % 7 === 3).isEmpty,
      "the registry did not block a blocked doc_id on objstub")
  }

  test("catalog refresh on copy+delete-rename semantics: the delta " +
      "audit holds, changed documents replace through the PUT " +
      "fallback, and the refreshed catalog parses back") {
    import org.apache.spark.sql.functions.{col, lit}
    val gx = -5216639.6695348294
    val gy = 6199081.688491997
    def consistentOf(layers: Seq[(String, Double)]) =
      layers.toDF("cog_filename", "shift").select(
        col("cog_filename"), lit(5070).as("crs_epsg"),
        lit("indicator").as("data_type"), lit("water").as("wri_domain"),
        lit("status").as("wri_dimension"),
        lit(gx).as("extent_xmin"),
        (lit(gx + 96 * 90.0) + col("shift")).as("extent_xmax"),
        lit(gy - 64 * 90.0).as("extent_ymin"), lit(gy).as("extent_ymax"),
        col("cog_filename").as("filepath"),
        col("cog_filename").as("filename"))
    val localRoot = java.nio.file.Files
      .createTempDirectory("objstub_stac").toString
    val root = s"objstub://$localRoot"
    graft.wri.Stac.run(spark, consistentOf(Seq(
      "keep.tif" -> 0.0, "drift.tif" -> 0.0, "gone.tif" -> 0.0)), root)
    val audit = graft.wri.Stac.refreshCatalog(spark, consistentOf(Seq(
        "keep.tif" -> 0.0, "drift.tif" -> 900.0, "fresh.tif" -> 0.0)),
      root, pruneOrphans = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(audit == Map("keep" -> "unchanged", "drift" -> "rewritten",
      "fresh" -> "written", "gone" -> "pruned"),
      s"objstub refresh audit drifted: $audit")
    val itemsDir =
      s"$root/collections/${graft.wri.Model.collectionId}/items"
    val items = graft.wri.Stac.readItems(spark, itemsDir)
    assert(items.select($"item_id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("drift", "fresh", "keep"),
      "refreshed objstub catalog did not parse back to the delta set")
    // the rewritten document carries the NEW extent (its east edge
    // moved 900 m): bbox differs from the untouched layer's
    val bb = items.select($"item_id", $"bbox_e").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bb("drift") != bb("keep"),
      "the changed document was not actually rewritten on objstub")
  }
}

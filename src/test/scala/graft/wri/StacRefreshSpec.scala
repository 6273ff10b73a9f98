package graft.wri

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Stac.refreshCatalog]] legs the DuckDB oracle cannot see: untouched
  * files keep their bytes AND mtimes (the rsync/CDN no-op property),
  * orphans survive un-pruned by default, and the collection document
  * tracks the post-delta item set. */
class StacRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val gx = -5216639.6695348294
  private val gy = 6199081.688491997

  private def consistentOf(layers: Seq[(String, Double)]): DataFrame =
    layers.toDF("cog_filename", "shift").select(
      col("cog_filename"), lit(5070).as("crs_epsg"),
      lit("indicator").as("data_type"), lit("water").as("wri_domain"),
      lit("status").as("wri_dimension"),
      lit(gx).as("extent_xmin"),
      (lit(gx + 96 * 90.0) + col("shift")).as("extent_xmax"),
      lit(gy - 64 * 90.0).as("extent_ymin"), lit(gy).as("extent_ymax"),
      col("cog_filename").as("filepath"),
      col("cog_filename").as("filename"))

  test("refreshCatalog commits only the delta: unchanged files keep " +
      "their mtime, changed documents rewrite, orphans report (and " +
      "only prune on request), and the collection tracks the result") {
    val root = java.nio.file.Files
      .createTempDirectory("stac_refresh").toString
    val itemsDir = s"$root/collections/${Model.collectionId}/items"
    Stac.run(spark, consistentOf(Seq(
      "keep.tif" -> 0.0, "drift.tif" -> 0.0, "gone.tif" -> 0.0)), root)
    val keepFile = new java.io.File(s"$itemsDir/keep.json")
    val driftFile = new java.io.File(s"$itemsDir/drift.json")
    val (keepM, driftBytes) =
      (keepFile.lastModified(),
        java.nio.file.Files.readAllBytes(driftFile.toPath).toSeq)
    Thread.sleep(1100) // local-fs mtime granularity can be a second
    val next = consistentOf(Seq(
      "keep.tif" -> 0.0, "drift.tif" -> 900.0, "fresh.tif" -> 0.0))
    // default: orphans are REPORTED, never deleted
    val audit = Stac.refreshCatalog(spark, next, root)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(audit == Map("keep" -> "unchanged", "drift" -> "rewritten",
      "fresh" -> "written", "gone" -> "orphaned"), audit.toString)
    assert(new java.io.File(s"$itemsDir/gone.json").exists(),
      "an orphan was deleted without pruneOrphans")
    assert(keepFile.lastModified() == keepM,
      "an unchanged item document was rewritten (mtime moved) — " +
        "catalog syncs would re-ship every file")
    assert(java.nio.file.Files.readAllBytes(driftFile.toPath).toSeq
      != driftBytes, "a changed item document was not rewritten")
    // idempotent: a second refresh with the same table is all-unchanged
    val again = Stac.refreshCatalog(spark, next, root, pruneOrphans = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(again == Map("keep" -> "unchanged", "drift" -> "unchanged",
      "fresh" -> "unchanged", "gone" -> "pruned"), again.toString)
    assert(!new java.io.File(s"$itemsDir/gone.json").exists())
    // the rebuilt collection links exactly the surviving items
    val coll = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$root/collections/${Model.collectionId}/collection.json")),
      "UTF-8")
    assert(coll.contains("fresh.json") && !coll.contains("gone.json"),
      "collection.json does not track the post-delta item set")
  }

  test("an EMPTY metadata table refuses the refresh BEFORE touching " +
      "anything — an upstream outage reading zero rows cannot gut a " +
      "published catalog through pruneOrphans") {
    val root = java.nio.file.Files
      .createTempDirectory("stac_refresh_empty").toString
    val itemsDir = s"$root/collections/${Model.collectionId}/items"
    Stac.run(spark, consistentOf(Seq("keep.tif" -> 0.0)), root)
    val e = intercept[IllegalArgumentException] {
      Stac.refreshCatalog(spark,
        consistentOf(Seq("keep.tif" -> 0.0)).limit(0), root,
        pruneOrphans = true)
    }
    assert(e.getMessage.contains("EMPTY"), e.getMessage)
    assert(new java.io.File(s"$itemsDir/keep.json").exists(),
      "an empty refresh destroyed catalog items before refusing")
  }
}

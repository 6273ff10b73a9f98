package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Clustered layouts must make per-file min-max statistics selective:
  * that is the property that lets a 100 TB scan skip files. Asserted by
  * reading each written file individually and checking its actual value
  * ranges — the same stats a parquet reader prunes on. */
class LayoutSpec extends SparkSpec {

  private def files(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq

  test("clusteredWrite yields disjoint per-file ranges on the cluster key") {
    val dir = Files.createTempDirectory("clustered").toString
    Layout.clusteredWrite(
      Tables.lineitem(spark, sfDir), dir, numFiles = 8, col("l_partkey"))
    val ranges = files(dir).map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.size > 1, "expected multiple files")
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: hi=$hi lo=$lo")
    }
  }

  test("zorderKey interleaves bits (locality in both dimensions)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("a", "b")
    val z = df.select(Layout.zorderKey($"a", $"b", 8))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(0L, 1L, 2L, 3L, 12L, 15L))
  }

  test("zorderKey is safe on IntegerType inputs (no mod-32 shift wrap)") {
    import spark.implicits._
    // bit 20 interleaves to position 40 — past an int shift's mod-32 wrap
    val big = 1 << 20
    val ints = Seq((big, big)).toDF("a", "b")
    val longs = Seq((big.toLong, big.toLong)).toDF("a", "b")
    val zi = ints.select(Layout.zorderKey($"a", $"b", 21)).head().getLong(0)
    val zl = longs.select(Layout.zorderKey($"a", $"b", 21)).head().getLong(0)
    assert(zi == zl && zi == 3L << 40)
  }

  test("zorder layout beats linear sort on a 2D box query (file skipping)") {
    val li = Tables.lineitem(spark, sfDir)
    val Array(pMin, pMax, sMin, sMax) = li
      .agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey"))
      .head().toSeq.map(_.toString.toDouble).toArray

    // bits=4 keeps the query box quadrant-aligned on the 16x16 grid (its
    // z-range is one contiguous prefix, not fragmented chunks); 64 files
    // makes each file's min-max envelope small enough that the z-run
    // rectangles stop swallowing the box corner by accident
    val zDir = Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(li, zDir, numFiles = 64,
      col("l_partkey"), (pMin, pMax + 1),
      col("l_suppkey"), (sMin, sMax + 1), bits = 4)
    val linDir = Files.createTempDirectory("linear").toString
    Layout.clusteredWrite(li, linDir, numFiles = 64, col("l_partkey"))

    // box query: bottom-left ~quarter of each dimension
    val (pLo, pHi) = (pMin, pMin + (pMax - pMin) / 4)
    val (sLo, sHi) = (sMin, sMin + (sMax - sMin) / 4)
    def overlapping(dir: String): Int = files(dir).count { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_partkey"), max("l_partkey"),
          min("l_suppkey"), max("l_suppkey")).head()
      val (fpLo, fpHi, fsLo, fsHi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      fpLo <= pHi && fpHi >= pLo && fsLo <= sHi && fsHi >= sLo
    }
    val zHit = overlapping(zDir)
    val linHit = overlapping(linDir)
    // linear layout: every file spans the full suppkey range, so ~1/4 of
    // files match the box; zorder confines both dimensions per file
    assert(zHit < linHit,
      s"zorder should touch fewer files: zorder=$zHit linear=$linHit of 64")
    // and the layout changes nothing about the data itself
    assert(spark.read.parquet(zDir).count() == li.count())
  }

  test("compactWrite sizes file count from plan stats, not partitions") {
    val li = graft.Tables.lineitem(spark, sfDir)
    // fragment the input: 32 shuffle partitions would mean 32 tiny files
    val fragmented = li.repartition(32)
    val dir = Files.createTempDirectory("compact").toString
    val est = fragmented.queryExecution.optimizedPlan.stats
      .sizeInBytes.toDouble * 0.35
    val target = math.max(1L, (est / 3).toLong) // aim for ~3 files
    val n = Layout.compactWrite(fragmented, dir, targetBytes = target)
    assert(n >= 2 && n <= 4, s"expected ~3 files from the estimate, got $n")
    val written = files(dir)
    assert(written.length == n,
      s"file count ${written.length} != chosen partitioning $n")
    assert(spark.read.parquet(dir).count() == li.count())
    // a huge target collapses the fragments into ONE file
    val one = Files.createTempDirectory("compact1").toString
    assert(Layout.compactWrite(fragmented, one, targetBytes = Long.MaxValue) == 1)
    assert(files(one).length == 1)
  }

  test("compactWrite with keys range-clusters AND right-sizes at once") {
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    val dir = Files.createTempDirectory("compact_keys").toString
    val est = li.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble * 0.35
    val n = Layout.compactWrite(li, dir, targetBytes = math.max(1L, (est / 4).toLong),
      keys = Seq(col("l_orderkey")))
    assert(n >= 2, s"want multiple files to check disjointness, got $n")
    // per-file orderkey ranges must be (tie-modulo) disjoint: range
    // clustering survived the compaction sizing
    val ranges = files(dir).map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(loB >= hiA, s"overlapping file ranges: $ranges")
      case _ =>
    }
  }
}

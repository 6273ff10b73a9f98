package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan efficiency at 100 TB: range clustering
  * and Z-order (Morton) clustering.
  *
  * Parquet readers skip row groups / files whose min-max statistics
  * exclude the query predicate — but statistics only help if the writer
  * CLUSTERED the data so each file covers a narrow value range.
  * `clusteredWrite` gives one-dimensional clustering (disjoint per-file
  * ranges on the cluster key: a point/range query touches O(1) files);
  * `zorderKey` interleaves the bits of two dimensions so per-file ranges
  * are narrow in BOTH dimensions simultaneously — the standard layout for
  * two-sided selective scans (time × tenant, partkey × suppkey) where a
  * linear sort would leave every file spanning the full second dimension.
  *
  * Reference analog: the COG layout discipline (tiles clustered so an HTTP
  * range request reads one tile, not the raster) applied to columnar
  * tables.
  */
object Layout {

  /** Range-clustered parquet write: `numFiles` output files with
    * pairwise-disjoint (modulo range-boundary ties) sorted ranges of
    * `keys`. repartitionByRange samples the key distribution, so skew
    * yields balanced files, not equal-width ranges. */
  def clusteredWrite(df: DataFrame, path: String, numFiles: Int,
      keys: Column*): Unit =
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)

  /** Scale a numeric column into the integer grid [0, 2^bits) given its
    * (min, max) domain — the quantization step before bit interleaving. */
  def gridCell(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(max > min, s"degenerate domain [$min, $max]")
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) / lit(max - min) * lit(cells))
        .cast("long")))
  }

  /** Morton (Z-order) key: interleaves the low `bits` bits of two grid
    * cells (a in even positions, b in odd). Pure bit arithmetic — one
    * codegen'd expression, no UDF. Inputs are cast to long first: the
    * interleave shifts up to 2*bits-1 (= 61) positions, and Spark's
    * shiftleft on an integer column wraps the distance mod 32, which
    * would silently corrupt the key for IntegerType inputs. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order-clustered write over two numeric dimensions: grid-quantize
    * each to `bits` bits, cluster files by the interleaved key. The key
    * is layout-only — it does not appear in the written schema. */
  def zorderWrite(df: DataFrame, path: String, numFiles: Int,
      dimA: Column, domainA: (Double, Double),
      dimB: Column, domainB: (Double, Double),
      bits: Int = 16): Unit = {
    val z = zorderKey(
      gridCell(dimA, domainA._1, domainA._2, bits),
      gridCell(dimB, domainB._1, domainB._2, bits), bits)
    df.withColumn("__zkey", z)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Statistics-driven compaction write: sizes the output file count
    * from Catalyst's own size estimate (`optimizedPlan.stats`), so a
    * selective pipeline that shrank 100 TB to 50 GB writes ~50 GB /
    * `targetBytes` files instead of one-tiny-file-per-shuffle-partition
    * — the small-files problem is a write-side layout decision, like
    * clustering. `sizeRatio` corrects in-memory stats to on-disk bytes
    * (columnar encoding + compression; parquet commonly lands at
    * 20-50% of the in-memory estimate — calibrate per table).
    * Round-robin repartition balances file sizes regardless of key
    * skew; pass `keys` to get range clustering AND right-sized files at
    * once. Returns the chosen file count. */
  def compactWrite(df: DataFrame, path: String, targetBytes: Long,
      sizeRatio: Double = 0.35, keys: Seq[Column] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(sizeRatio > 0 && sizeRatio <= 1, s"sizeRatio in (0,1]: $sizeRatio")
    val estBytes =
      df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble * sizeRatio
    val numFiles = math.max(1, math.ceil(estBytes / targetBytes).toInt)
    val shaped =
      if (keys.isEmpty) df.repartition(numFiles)
      else df.repartitionByRange(numFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
    shaped.write.mode("overwrite").parquet(path)
    numFiles
  }
}

package graft.ops

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rerun-safety of the partition-granular MERGE write-back: only touched
  * partitions are rewritten, untouched partition files are left byte-for-
  * byte alone, and re-running the same merge writes nothing at all — the
  * table-scale twin of the reference's skip-if-exists sink discipline. */
class MergeWriteSpec extends SparkSpec {

  private val buckets = 8

  private def customers: DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))

  /** The q88 update set: every 7th customer bumped, every 13th inserted
    * under a collision-free key. */
  private def updates: DataFrame = {
    val cust = customers
    cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") + 100.0, 2).as("c_acctbal"),
        col("c_mktsegment"))
      .unionByName(cust.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          concat(col("c_name"), lit("_new")).as("c_name"),
          lit(0.0).as("c_acctbal"), lit("MACHINERY").as("c_mktsegment")))
  }

  /** file name -> (size, mtime) for every data file under the table. */
  private def fileState(root: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  private def freshDir(): Path = Files.createTempDirectory("merge_write_")

  test("write-back touches only changed partitions and reruns write nothing") {
    val dir = freshDir().toString
    MergeWrite.seed(customers, "c_custkey", buckets, dir)
    val before = fileState(dir)

    // First merge: some buckets change (every 7th key is spread across
    // buckets, so most change — assert at least one does and that any
    // bucket WITHOUT a changed key is untouched on disk).
    val r1 = MergeWrite.upsertWrite(spark, dir, updates, "c_custkey", buckets)
    assert(r1.bucketsChanged > 0 && r1.rowsWritten > 0)
    val after1 = fileState(dir)
    val changedBuckets = updates
      .select(pmod(col("c_custkey").cast("long"), lit(buckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val untouched = before.filter { case (p, _) =>
      "bucket=(\\d+)".r.findFirstMatchIn(p)
        .exists(m => !changedBuckets.contains(m.group(1).toInt))
    }
    untouched.foreach { case (p, st) =>
      assert(after1.get(p).contains(st), s"untouched partition rewritten: $p")
    }

    // Snapshot content equals the one-shot merge semantics (q88 oracle
    // shape: update wins, keeps pass through, inserts appear).
    val got = spark.read.parquet(dir).drop("bucket")
    val expect = MergeWrite.mergeSnapshot(customers, updates, "c_custkey")
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)

    // Rerun with identical updates: every fingerprint matches, zero
    // partitions written, zero bytes on disk move.
    val r2 = MergeWrite.upsertWrite(spark, dir, updates, "c_custkey", buckets)
    assert(r2.bucketsChanged == 0 && r2.rowsWritten == 0L)
    assert(fileState(dir) == after1, "rerun must not rewrite any file")
  }

  test("a delta touching one bucket rewrites exactly that bucket") {
    val dir = freshDir().toString
    MergeWrite.seed(customers, "c_custkey", buckets, dir)
    val before = fileState(dir)
    val oneKey = customers.filter(col("c_custkey") === 1)
      .withColumn("c_acctbal", lit(9999.99))
    val r = MergeWrite.upsertWrite(spark, dir, oneKey, "c_custkey", buckets)
    assert(r.bucketsChanged == 1)
    val after = fileState(dir)
    val rewritten = before.keySet.filter(p => !after.get(p).contains(before(p)))
      .union(after.keySet.diff(before.keySet))
    assert(rewritten.nonEmpty)
    assert(rewritten.forall(_.contains(s"bucket=${1 % buckets}")))
    // and the row really changed
    val bal = spark.read.parquet(dir).filter(col("c_custkey") === 1)
      .select("c_acctbal").collect().map(_.getDouble(0)).toSeq
    assert(bal == Seq(9999.99))
  }

  test("no leaked persistent RDDs after a write-back") {
    val dir = freshDir().toString
    MergeWrite.seed(customers, "c_custkey", buckets, dir)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    MergeWrite.upsertWrite(spark, dir, updates, "c_custkey", buckets)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "upsertWrite must release its staging checkpoint")
  }
}

package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Hive-style partitioned layout + partition pruning: at 100 TB the
  * cheapest scan is the one that never opens the file, so a filter on
  * the partition column must turn into PartitionFilters (directory
  * pruning), not a row filter. */
class PartitionPruningSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("docs_partitioned").toString
    Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("lang").parquet(d)
    d
  }

  // the files the EXECUTED scan actually selected (inputFiles reports the
  // whole relation, pre-pruning)
  private def scannedFiles(q: org.apache.spark.sql.DataFrame): Seq[String] =
    q.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
    }.flatten

  test("filter on the partition column becomes PartitionFilters") {
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("text"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in:\n$plan")
    // the pruned scan reads only the en partition's files
    val en = scannedFiles(q)
    assert(en.nonEmpty && en.forall(_.contains("lang=en")),
      s"scan touched non-matching partitions: ${en.filterNot(_.contains("lang=en")).take(3).mkString(", ")}")
  }

  test("partitioned round-trip preserves rows and values") {
    val back = spark.read.parquet(dir)
    val orig = Tables.documents(spark, sfDir)
    assert(back.count() == orig.count())
    val b = back.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val o = orig.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b == o, "lang values drifted through the partitioned layout")
  }

  test("per-partition file counts match the lang cardinalities") {
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val files = scannedFiles(spark.read.parquet(dir)
        .filter(col("lang") === l))
      assert(files.nonEmpty, s"no files for lang=$l")
      assert(files.forall(_.contains(s"lang=$l")))
    }
  }
}

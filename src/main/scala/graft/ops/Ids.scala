package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global ID assignment — contiguous 0..N-1 ids in sort order
  * WITHOUT the single-partition window a naive
  * `row_number() over (order by ...)` plans (Spark moves the whole
  * dataset to one task for an unpartitioned window; at 100 TB that one
  * task IS the job).
  *
  * Shape: range-repartition on the sort key, sort within partitions,
  * then a count-and-offset pass — each partition is counted (one narrow
  * job emitting #partitions longs), the prefix-sum offset is added to
  * each row's local position, and no stage ever concentrates the data.
  * The ids equal the global rank by the sort key regardless of where the
  * sampled range boundaries land, because offsets come from the ACTUAL
  * partition contents; the only requirement is that `sortCols` is a
  * total order (append a unique tiebreaker if the prefix can tie).
  */
object Ids {

  /** (id, <original columns>) with id = dense 0-based global rank by
    * `sortCols`. The offset pass is `RDD.zipWithIndex` — the canonical
    * per-partition imperative step (count job + broadcast offsets)
    * behind a one-line API; range partition order makes the ids globally
    * sorted. */
  def assignIds(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    require(sortCols.nonEmpty, "assignIds needs at least one sort column")
    val cols = sortCols.map(col)
    val parted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
    val schema = StructType(
      StructField("id", LongType, nullable = false) +: parted.schema.fields)
    val rows = parted.rdd.zipWithIndex.map { case (r, id) =>
      Row.fromSeq(id +: r.toSeq)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }

  /** Same contract built purely on the declarative API: per-partition
    * local row_number (window keyed on the partition id) plus broadcast
    * prefix offsets — one extra tiny shuffle, no RDD step. Shipped as
    * the reference twin; the spec pins both to identical output. */
  def assignIdsWindowed(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    require(sortCols.nonEmpty, "assignIds needs at least one sort column")
    val cols = sortCols.map(col)
    val parted = df.repartitionByRange(cols: _*).sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(cols: _*)
    // prefix-sum the per-partition counts; #partitions rows, broadcast
    // back (global window over a bounded frame — single-partition key
    // via [[Windows.singlePartitionKey]], so no WindowExec WARN)
    val offsets = parted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(Windows.singlePartitionKey(col("__pid")))
            .orderBy(col("__pid"))
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__pid"), col("off"))
    parted
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("id", col("off") + row_number().over(w).cast("long") - 1L)
      .drop("__pid", "off")
      .select(col("id") +: df.columns.map(col): _*)
  }
}

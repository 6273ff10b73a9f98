package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Plain parquet reads so Catalyst can push
  * filters/projections into the scan (`PushedFilters`/`ReadSchema`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  /** events.ts normalization. Driver generations have shipped the column
    * as parquet TIMESTAMP(NANOS) (Spark 4 refuses it by default — read as
    * long nanos and convert; integer `div` because ~1.7e18 ns exceeds
    * double's exact integer range) and as TIMESTAMP(MICROS) without the
    * UTC-adjusted flag (Spark reads that as TIMESTAMP_NTZ, which
    * `unix_micros`/watermarks reject). Both are normalized to a µs
    * TimestampType column; the session timezone is UTC everywhere, so the
    * NTZ cast preserves the stored micros exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** One verifiable query: a Spark plan plus (when SQL-expressible) the DuckDB
  * oracle SQL the driver hash-compares against. Column names/types must match
  * between the two (driver sorts columns by name before hashing).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

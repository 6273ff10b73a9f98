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

  /** Synthesized partsupp: the driver testdata has no partsupp parquet,
    * so the table is DERIVED in-plan as a deterministic integer function
    * of `part` x the supplier count — 4 suppliers per part
    * (`(p_partkey*4 + i) % s_total + 1`, i in 0..3, distinct for any
    * s_total >= 4 because the increments are consecutive), with availqty
    * and supplycost as modular mixes of the two keys. Supplycost is
    * carried as exact integer CENTS (`ps_supplycost_cents`) so value
    * aggregates stay integer-exact in any engine and summation order;
    * `ps_supplycost = cents / 100.0` is the only floating-point step.
    * The DuckDB oracle replays the identical arithmetic as a CTE over
    * the same parquet (see [[graft.suites.Tpch.partsuppCte]]), which
    * makes every partsupp query SF-portable — no pinned values.
    * Scale shape: one 1-row count broadcast + a 4-way explode of the
    * part scan; nothing shuffles. */
  def partsupp(s: SparkSession, d: String): DataFrame = {
    val sCount = supplier(s, d).agg(count(lit(1)).as("__s_total"))
    part(s, d).select(col("p_partkey"))
      .crossJoin(broadcast(sCount))
      .select(col("p_partkey"), col("__s_total"),
        explode(array((0L to 3L).map(lit(_)): _*)).as("__i"))
      .withColumn("ps_suppkey",
        pmod(col("p_partkey") * lit(4L) + col("__i"), col("__s_total")) +
          lit(1L))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        (pmod(col("p_partkey") * lit(7L) + col("ps_suppkey") * lit(11L),
          lit(9999L)) + lit(1L)).as("ps_availqty"),
        (pmod(col("p_partkey") * lit(31L) + col("ps_suppkey") * lit(17L),
          lit(10000L)) + lit(100L)).as("ps_supplycost_cents"))
      .withColumn("ps_supplycost",
        col("ps_supplycost_cents") / lit(100.0))
  }

  /** Synthesized shipping columns (the [[partsupp]] precedent): the
    * driver lineitem has no l_shipmode/l_commitdate/l_receiptdate, so
    * TPC-H Q12's surface is DERIVED in-plan as deterministic modular
    * mixes of the line keys — shipmode picks one of the 7 classic modes
    * by (l_orderkey*3 + l_linenumber) mod 7, commit/receipt dates are
    * shipdate plus bounded day offsets (commit in [0,35), receipt in
    * [1,30]), so the late-delivery predicates (ship < commit < receipt)
    * select a nontrivial, SF-portable subset. The DuckDB oracle replays
    * the identical arithmetic as a CTE over the same parquet
    * ([[graft.suites.Tpch.lineitemShipCte]]). Scale shape: pure map
    * over the lineitem scan — zero shuffles, zero extra reads. */
  def lineitemShipping(s: SparkSession, d: String): DataFrame = {
    val modes =
      Seq("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")
    lineitem(s, d)
      .withColumn("l_shipmode",
        element_at(typedLit(modes),
          (pmod(col("l_orderkey") * lit(3L) + col("l_linenumber"), lit(7L)) +
            lit(1L)).cast("int")))
      .withColumn("l_commitdate",
        date_add(to_date(col("l_shipdate")),
          pmod(col("l_orderkey") + col("l_linenumber") * lit(7L), lit(35L))
            .cast("int")))
      .withColumn("l_receiptdate",
        date_add(to_date(col("l_shipdate")),
          (pmod(col("l_orderkey") * lit(5L) + col("l_linenumber") * lit(3L),
            lit(30L)) + lit(1L)).cast("int")))
  }
}

/** One verifiable query: a Spark plan plus (when SQL-expressible) the DuckDB
  * oracle SQL the driver hash-compares against. Column names/types must match
  * between the two (driver sorts columns by name before hashing).
  *
  * `oracleGen` is for oracles that must be DERIVED from the data at the
  * verified scale factor (e.g. the IVF/PQ replays, whose k-means training
  * is not SQL-expressible): Verify calls it with the session + SF dir and
  * dumps the produced SQL, so the oracle is SF-portable instead of a
  * pinned-values snapshot of one SF. At most one of oracle/oracleGen is
  * set.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[(SparkSession, String) => String] = None)

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at scale (SURVEY "Optimize for
  * scale": salting). A 100 TB corpus routinely has keys orders of
  * magnitude hotter than the median; a plain groupBy sends each key to
  * one reducer. Salted aggregation shards every key across `buckets`
  * partial groups, aggregates, then merges — same result, bounded
  * per-task load.
  */
object Skew {

  /** Deterministic row salt in [0, buckets). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted sum/count of `valueCol` grouped by `keyCol`:
    * result-identical to `df.groupBy(keyCol).agg(sum, count)` but the
    * first shuffle distributes each key over `buckets` reducers. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(buckets, col(valueCol), col(keyCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))

  /** Salted equi-join for a skewed big side: each big-side row gets a
    * salt in [0, buckets); the small side replicates `buckets` times
    * (one copy per salt) so the join key becomes (key, salt) and a hot
    * key's rows spread over `buckets` reducers instead of melting one.
    * Result-identical to `big.join(small, keyCol)` — replication only
    * multiplies the SMALL side, every big-side row still matches
    * exactly its key's copies.
    *
    * SALT CONTRACT: result-wise, any salt value in [0, buckets) meets a
    * small-side copy — but the salt must still be DETERMINISTIC UNDER
    * TASK RETRY, because it is a shuffle-join key: a recomputed map
    * task that re-drew different salts (rand, monotonically increasing
    * ids — both re-draw when an upstream shuffle replays rows in a
    * different fetch order) would route rows to reduce partitions that
    * other reducers already fetched, silently duplicating or dropping
    * them (the SPARK-23207 failure class). The default salt is
    * therefore `hash(key, spark_partition_id())` — both inputs are
    * recompute-stable and the row payload is never hashed (big-side
    * rows often carry wide text/code arrays). Its spread limit: a hot
    * key spreads only across the input partitions it spans, so a frame
    * PARTITIONED BY the join key (a groupBy/dedup output, an explicit
    * repartition on the key) collapses each key to one salt and gets
    * no spread at all. For those frames — or whenever a per-ROW
    * deterministic spread is wanted — pass `saltFrom` naming one or
    * more cheap high-cardinality columns (a unique id column is ideal:
    * full spread, recompute-stable, payload still untouched).
    *
    * This is the manual form of AQE's skew-join split, for the cases
    * AQE cannot see (skew introduced after the last stats boundary) or
    * when the small side is mid-sized: salting composes with a shuffle
    * join, not just broadcast. The `explode` replication is map work;
    * the small side grows buckets-fold, which is the explicit, bounded
    * price of the spread. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      buckets: Int = 16, saltFrom: Seq[String] = Seq.empty): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1: $buckets")
    val saltExpr =
      if (saltFrom.nonEmpty) salt(buckets, saltFrom.map(col): _*)
      else salt(buckets, col(keyCol), spark_partition_id())
    val saltedBig = big.withColumn("_salt", saltExpr)
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    saltedBig.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}

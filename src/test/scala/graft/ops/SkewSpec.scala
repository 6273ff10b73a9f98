package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key 1L carries 80% of the rows — the salted spread target
  private def big = ((1 to 400).map(i => (1L, i.toLong)) ++
    (1 to 100).map(i => (1L + i % 7, i.toLong * 10)))
    .toDF("key", "v")
  private def small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched"))
    .toDF("key", "label")

  test("saltedSumCount equals the plain groupBy") {
    val plain = big.groupBy("key").agg(sum("v"), count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(big, "key", "v", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val plain = big.join(small, Seq("key")).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain, "salting must be result-invisible (multiset)")
  }

  test("saltedJoin handles duplicate keys on the small side") {
    val dupSmall = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("key", "label")
    val plain = big.join(dupSmall, Seq("key")).count()
    assert(Skew.saltedJoin(big, dupSmall, "key", buckets = 4).count() == plain)
  }

  test("saltedJoin joins on (key, salt): the hot key spreads") {
    val j = Skew.saltedJoin(big, small, "key", buckets = 8)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"join did not include the salt key:\n$p")
    // spread witness on the DEFAULT salt (hash of key + partition id —
    // recompute-stable, payload never hashed): the documented contract
    // is that a hot key spreads WHEN it spans input partitions, the
    // shape every scanned/post-shuffle frame has — a single-partition
    // local relation is exactly the case saltFrom exists for
    val spread = big.repartition(16).filter(col("key") === 1L)
      .withColumn("s", Skew.salt(8, col("key"), spark_partition_id()))
      .select("s").distinct().count()
    assert(spread > 4, s"hot key only used $spread of 8 buckets")
  }

  test("saltFrom pins the salt to named columns, deterministically, and " +
      "stays result-identical") {
    val plain = big.join(small, Seq("key")).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8,
        saltFrom = Seq("v")).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain, "pinned salt must stay result-invisible")
    // deterministic: the pinned salt is a pure function of the named
    // column, stable across runs and repartitionings
    val a = big.withColumn("s", Skew.salt(8, col("v")))
      .select("v", "s").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = big.repartition(5).withColumn("s", Skew.salt(8, col("v")))
      .select("v", "s").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b, "saltFrom salt must not depend on partitioning")
  }
}

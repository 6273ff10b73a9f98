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

  test("saltedJoin joins on (key, salt); the default salt spreads a " +
      "hot key across the partitions it spans, collapses on a " +
      "key-partitioned frame, and saltFrom restores full spread") {
    val j = Skew.saltedJoin(big, small, "key", buckets = 8)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"join did not include the salt key:\n$p")
    // the DEFAULT salt expression (hash of key + partition id —
    // recompute-stable, payload never hashed) measured on the exact
    // input shapes the docstring names
    def spreadOf(df: org.apache.spark.sql.DataFrame,
        s: org.apache.spark.sql.Column): Long =
      df.filter(col("key") === 1L).withColumn("s", s)
        .select("s").distinct().count()
    val defaultSalt = Skew.salt(8, col("key"), spark_partition_id())
    assert(spreadOf(big.repartition(16), defaultSalt) > 4,
      "hot key spanning 16 partitions did not spread")
    // the documented degradation: partitioned BY the key, one salt —
    // the shape callers must hand to saltFrom instead
    assert(spreadOf(big.repartition(col("key")), defaultSalt) == 1L)
    assert(spreadOf(big.repartition(col("key")),
      Skew.salt(8, col("v"))) > 4, "saltFrom did not restore the spread")
    // and the degraded shape still joins result-correctly
    val plain = big.join(small, Seq("key")).count()
    assert(Skew.saltedJoin(big.repartition(col("key")), small, "key",
      buckets = 8).count() == plain)
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

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 5000L).toDF("k")

  test("checksum is order- and partitioning-independent") {
    val a = Checksum.tableChecksum(df, $"k").head
    val b = Checksum.tableChecksum(
      df.repartition(17).orderBy($"k".desc), $"k").head
    assert(a == b)
  }

  test("a single changed row changes the digest; counts catch drops") {
    val base = Checksum.tableChecksum(df, $"k").head
    val edited = Checksum.tableChecksum(
      df.withColumn("k", when($"k" === 42L, 43L).otherwise($"k")), $"k").head
    assert(base.getLong(1) != edited.getLong(1), "edit must move the digest")
    val dropped = Checksum.tableChecksum(df.filter($"k" =!= 7L), $"k").head
    assert(dropped.getLong(0) == base.getLong(0) - 1)
    assert(dropped.getLong(1) != base.getLong(1))
  }

  test("checksums merge: shard digests sum to the whole-table digest") {
    val whole = Checksum.tableChecksum(df, $"k").head
    val lo = Checksum.tableChecksum(df.filter($"k" <= 2500L), $"k").head
    val hi = Checksum.tableChecksum(df.filter($"k" > 2500L), $"k").head
    assert(lo.getLong(0) + hi.getLong(0) == whole.getLong(0))
    assert(lo.getLong(1) + hi.getLong(1) == whole.getLong(1),
      "plain integer sum must be mergeable across shards")
  }
}

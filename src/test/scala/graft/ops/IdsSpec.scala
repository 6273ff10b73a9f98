package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IdsSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 1000).map(i => ((i * 7919) % 1000, i))
    .toDF("key", "tie").repartition(13)

  test("assignIds: dense 0..N-1 ids in global sort order") {
    val out = Ids.assignIds(df, Seq("key", "tie")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 1000L).toSeq, "ids dense 0..N-1")
    val keys = out.map(x => (x._2, x._3)).toSeq
    assert(keys == keys.sorted, "id order must equal sort order")
  }

  test("assignIds equals the declarative windowed twin") {
    val a = Ids.assignIds(df, Seq("key", "tie"))
      .orderBy($"id").collect().map(_.toSeq).toSeq
    val b = Ids.assignIdsWindowed(df, Seq("key", "tie"))
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("assignIds is input-partitioning invariant") {
    val a = Ids.assignIds(df.repartition(3), Seq("key", "tie"))
      .orderBy($"id").collect().map(_.toSeq).toSeq
    val b = Ids.assignIds(df.repartition(29), Seq("key", "tie"))
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("assignIdsWindowed plans no single-partition global window") {
    val p = Ids.assignIdsWindowed(df, Seq("key", "tie"))
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"),
      s"ids must range-partition, not globally sort:\n$p")
    // the data-bearing window is keyed on the partition id (the only
    // SinglePartition piece is the #partitions-row offsets prefix sum)
    assert(p.contains("windowspecdefinition(__pid"),
      s"row_number must partition by __pid:\n$p")
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CardinalitySpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"))
    .toDF("key", "l")
  private val right = Seq((1L, "x"), (1L, "y"), (1L, "z"), (3L, "w"),
    (9L, "unmatched")).toDF("key", "r")

  test("joinCardinality predicts the exact join output size") {
    // key 1: 2*3=6, key 2: no match, key 3: 1*1=1 -> 7
    val predicted = Cardinality.joinCardinality(left, right, "key")
      .head().getLong(0)
    assert(predicted == 7L)
    assert(left.join(right, Seq("key")).count() == predicted)
  }

  test("disjoint keys predict zero, not null") {
    val other = Seq((100L, "q")).toDF("key", "r")
    assert(Cardinality.joinCardinality(left, other, "key")
      .head().getLong(0) == 0L)
  }

  test("guardedJoin passes under the cap and refuses above it") {
    assert(Cardinality.guardedJoin(left, right, "key", maxRows = 7).count() == 7)
    val e = intercept[IllegalStateException] {
      Cardinality.guardedJoin(left, right, "key", maxRows = 6)
    }
    assert(e.getMessage.contains("predicted 7"))
  }
}

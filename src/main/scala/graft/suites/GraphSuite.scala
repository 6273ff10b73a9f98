package graft.suites

import graft.{Q, Tables}
import graft.ops.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a customer -> supplier trade graph derived from
  * orders x lineitem (who buys from whom). Supplier node ids are offset
  * by 1e6 so the two key spaces stay disjoint.
  */
object GraphSuite {

  lazy val all: Seq[Q] = Seq(
    Q("q110_pagerank", q110, Some(q110Sql)),
    Q("q113_graph_degrees", q113, Some(q113Sql))
  )

  private def tradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + lit(1000000L)).as("dst"))

  /** Integer-exact damped PageRank ([[Graph.pageRank]]), 3 iterations on
    * the trade graph. Every arithmetic step is scaled-long integer math,
    * so the DuckDB oracle replays the full iteration unrolled and the
    * comparison is bit-exact — no floating-point summation-order slack.
    * Customers only ever cite suppliers, so supplier authority
    * concentrates while dangling suppliers recycle their mass uniformly —
    * both paths (contribution split and dangling redistribution) carry
    * real weight in the fixture. */
  private def q110(s: SparkSession, d: String): DataFrame =
    Graph.pageRank(tradeEdges(s, d), iters = 3)
      .orderBy(col("node"))

  private val q110Sql = {
    // one iteration of the integer-exact recurrence, parameterized by the
    // previous rank CTE name; unrolled 3x below
    def iter(i: Int, prev: String): String =
      s"""c$i AS (SELECT dst AS node, sum(r // odeg) AS inc
         |  FROM e JOIN od USING (src) JOIN $prev ON $prev.node = e.src
         |  GROUP BY dst),
         |d$i AS (SELECT coalesce(sum(r), 0) AS dm
         |  FROM $prev LEFT JOIN od ON $prev.node = od.src
         |  WHERE od.src IS NULL),
         |r$i AS (SELECT nodes.node,
         |    CAST((3 * 1000000000000) // (20 * n)
         |      + (17 * (coalesce(inc, 0) + dm // n)) // 20 AS BIGINT) AS r
         |  FROM nodes CROSS JOIN p CROSS JOIN d$i
         |  LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    s"""WITH e AS (SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |p AS (SELECT count(*) AS n FROM nodes),
       |od AS (SELECT src, count(*) AS odeg FROM e GROUP BY src),
       |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, p),
       |${iter(1, "r0")},
       |${iter(2, "r1")},
       |${iter(3, "r2")}
       |SELECT node, r FROM r3 ORDER BY node""".stripMargin
  }

  /** Degree summary ([[Graph.degrees]]): out/in/total per node over the
    * distinct trade edges — two partially-aggregated keyed counts meeting
    * in a full-outer join, nothing wider. */
  private def q113(s: SparkSession, d: String): DataFrame =
    Graph.degrees(tradeEdges(s, d))
      .orderBy(col("node"))

  private val q113Sql =
    """WITH e AS (SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src),
      |i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY dst)
      |SELECT coalesce(o.node, i.node) AS node,
      |  coalesce(out_deg, 0) AS out_deg,
      |  coalesce(in_deg, 0) AS in_deg,
      |  coalesce(out_deg, 0) + coalesce(in_deg, 0) AS degree
      |FROM o FULL OUTER JOIN i ON o.node = i.node
      |ORDER BY node""".stripMargin
}

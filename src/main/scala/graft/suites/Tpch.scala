package graft.suites

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic TPC-H join pipelines (Q3 / Q5 / Q9 shapes) over the driver
  * tables — the multi-join stress queries a warehouse engine is judged
  * on. Plan shape at scale, asserted in PlanSpec:
  *  - tiny dims (region, nation, supplier) enter as broadcast hash joins
  *    — no shuffle of the fact side for them;
  *  - the fact-fact joins (customer x orders x lineitem) shuffle on their
  *    keys once each, with AQE free to re-plan sizes at runtime;
  *  - filters (mktsegment, date windows, p_type) sit below the joins so
  *    they reach the parquet scans as PushedFilters, and column pruning
  *    keeps unused fact columns out of the shuffles entirely.
  *
  * Revenue aggregates are rounded to 2 dp in both engines (IEEE sum
  * order varies; rounded sums are stable), and every ORDER BY carries a
  * deterministic tiebreak.
  */
object Tpch {

  lazy val all: Seq[Q] = Seq(
    Q("q55_tpch_shipping_priority", q55, Some(q55Sql)),
    Q("q56_tpch_local_supplier_volume", q56, Some(q56Sql)),
    Q("q57_tpch_profit_by_nation_year", q57, Some(q57Sql)),
    Q("q61_tpch_small_quantity", q61, Some(q61Sql)),
    Q("q67_runtime_bloom_join", q67, Some(q67Sql)),
    Q("q74_tpch_returned_items", q74, Some(q74Sql)),
    Q("q75_tpch_order_distribution", q75, Some(q75Sql)),
    Q("q76_tpch_promo_revenue", q76, Some(q76Sql)),
    Q("q77_tpch_large_orders", q77, Some(q77Sql)),
    Q("q78_tpch_bracket_join", q78, Some(q78Sql)),
    Q("q79_tpch_sales_opportunity", q79, Some(q79Sql)),
    Q("q86_tpch_order_priority", q86, Some(q86Sql)),
    Q("q104_tpch_volume_shipping", q104, Some(q104Sql)),
    Q("q105_tpch_market_share", q105, Some(q105Sql)),
    Q("q106_tpch_waiting_supplier", q106, Some(q106Sql)),
    Q("q107_tpch_disjunctive_revenue", q107, Some(q107Sql)),
    Q("q108_tpch_top_supplier", q108, Some(q108Sql)),
    Q("q121_tpch_forecast_revenue", q121, Some(q121Sql)),
    Q("q125_tpch_min_cost_supplier", q125, Some(q125Sql)),
    Q("q126_tpch_important_stock", q126, Some(q126Sql)),
    Q("q127_tpch_parts_supplier_counts", q127, Some(q127Sql)),
    Q("q128_tpch_potential_promotion", q128, Some(q128Sql)),
    Q("q144_tpch_shipmode_priority", q144, Some(q144Sql))
  )

  /** Oracle twin of [[graft.Tables.lineitemShipping]]: the same
    * deterministic shipmode/commit/receipt derivation as a DuckDB CTE
    * over the same parquet — SF-portable, nothing pinned. */
  private[graft] val lineitemShipCte: String =
    """lineitem_ship AS (
      |  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS l_shipdate_d,
      |    (['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'])[
      |      CAST((l_orderkey * 3 + l_linenumber) % 7 AS INT) + 1]
      |      AS l_shipmode,
      |    CAST(l_shipdate AS DATE) +
      |      CAST((l_orderkey + l_linenumber * 7) % 35 AS INT)
      |      AS l_commitdate,
      |    CAST(l_shipdate AS DATE) +
      |      CAST((l_orderkey * 5 + l_linenumber * 3) % 30 + 1 AS INT)
      |      AS l_receiptdate
      |  FROM lineitem)""".stripMargin

  /** TPC-H Q12 (shipping modes and order priority): lines received in
    * 1996 by MAIL/SHIP that were committed after shipping and received
    * after committing (the late-commit discipline check), counted by
    * how many belong to urgent/high-priority orders. The shipmode and
    * both dates come from the deterministic in-plan synthesis
    * ([[graft.Tables.lineitemShipping]] — the partsupp precedent), so
    * the classic 21-query shape set is complete. Plan: the mode/date
    * predicates are pure map work over the lineitem scan; the single
    * join shuffles on the order key with AQE free to broadcast the
    * filtered line side. */
  private def q144(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitemShipping(s, d)
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("l_commitdate") < col("l_receiptdate") &&
        to_date(col("l_shipdate")) < col("l_commitdate") &&
        col("l_receiptdate") >= lit("1996-01-01").cast("date") &&
        col("l_receiptdate") < lit("1997-01-01").cast("date"))
      .select(col("l_orderkey"), col("l_shipmode"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_shipmode"))
      .agg(
        sum(when(hi, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(hi, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy(col("l_shipmode"))
  }

  private val q144Sql =
    s"""WITH $lineitemShipCte
       |SELECT l_shipmode,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       |FROM orders JOIN lineitem_ship ON o_orderkey = l_orderkey
       |WHERE l_shipmode IN ('MAIL', 'SHIP')
       |  AND l_commitdate < l_receiptdate
       |  AND l_shipdate_d < l_commitdate
       |  AND l_receiptdate >= DATE '1996-01-01'
       |  AND l_receiptdate < DATE '1997-01-01'
       |GROUP BY l_shipmode
       |ORDER BY l_shipmode""".stripMargin

  /** Oracle twin of [[graft.Tables.partsupp]]: the same deterministic
    * integer derivation as a DuckDB CTE over the same parquet, so every
    * partsupp query below is SF-portable — both engines COMPUTE the
    * table, nothing is pinned. */
  private[graft] val partsuppCte: String =
    """st AS (SELECT count(*) AS s_total FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |    (p_partkey * 4 + i) % s_total + 1 AS ps_suppkey,
      |    (p_partkey * 7 + ((p_partkey * 4 + i) % s_total + 1) * 11)
      |      % 9999 + 1 AS ps_availqty,
      |    (p_partkey * 31 + ((p_partkey * 4 + i) % s_total + 1) * 17)
      |      % 10000 + 100 AS ps_supplycost_cents
      |  FROM part, st, (VALUES (0), (1), (2), (3)) t(i))""".stripMargin

  /** TPC-H Q2 (min-cost supplier): for small parts in a size band, the
    * supplier(s) in EUROPE offering the per-part minimum supplycost.
    * The correlated min decorrelates into a per-part min aggregate over
    * the region-filtered partsupp joined back on (part, min-cents) —
    * supplier/nation/region and the filtered part list are broadcasts,
    * and the min compares exact integer cents, so there is no
    * float-equality trap. Top-100 under a fully deterministic order. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val regionSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val psEu = Tables.partsupp(s, d)
      .join(broadcast(regionSupp), col("ps_suppkey") === col("s_suppkey"))
    val minCost = psEu.groupBy(col("ps_partkey"))
      .agg(min(col("ps_supplycost_cents")).as("__min_cents"))
    psEu
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "SMALL" && col("p_size").between(10, 20))
          .select(col("p_partkey"), col("p_brand"))),
        col("ps_partkey") === col("p_partkey"))
      .join(minCost, Seq("ps_partkey"))
      .filter(col("ps_supplycost_cents") === col("__min_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"),
        (col("ps_supplycost_cents") / lit(100.0)).as("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  private val q125Sql =
    "WITH " + partsuppCte + """,
      |eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      |  FROM supplier s, nation n, region r
      |  WHERE s.s_nationkey = n.n_nationkey
      |    AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
      |pse AS (SELECT ps.*, eu.s_name, eu.s_acctbal, eu.n_name
      |  FROM partsupp ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey),
      |mc AS (SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
      |  FROM pse GROUP BY ps_partkey)
      |SELECT pse.s_acctbal, pse.s_name, pse.n_name, p.p_partkey,
      |  p.p_brand, pse.ps_supplycost_cents / 100.0 AS ps_supplycost
      |FROM pse
      |JOIN part p ON pse.ps_partkey = p.p_partkey
      |JOIN mc ON pse.ps_partkey = mc.ps_partkey
      |WHERE p.p_type = 'SMALL' AND p.p_size BETWEEN 10 AND 20
      |  AND pse.ps_supplycost_cents = mc.min_cents
      |ORDER BY pse.s_acctbal DESC, pse.n_name, pse.s_name, p.p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q11 (important stock): per-part stock value over ASIA
    * suppliers, kept when above a fixed fraction of the region total.
    * Value sums are exact integer cents*qty longs on both engines (the
    * integer-scaled-sum discipline) — the single /100.0 display division
    * and the fraction comparison are the only floating-point steps. The
    * region supplier list broadcasts; the corpus shuffles once on
    * ps_partkey; the grand total is a 1-row broadcast back. */
  private def q126(s: SparkSession, d: String): DataFrame = {
    val asiaSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val psAsia = Tables.partsupp(s, d)
      .join(broadcast(asiaSupp), col("ps_suppkey") === col("s_suppkey"))
      .withColumn("__v", col("ps_supplycost_cents") * col("ps_availqty"))
    val total = psAsia.agg(sum(col("__v")).cast("double").as("__total"))
    psAsia.groupBy(col("ps_partkey")).agg(sum(col("__v")).as("__sv"))
      .crossJoin(broadcast(total))
      .filter(col("__sv").cast("double") > lit(0.001) * col("__total"))
      .select(col("ps_partkey"),
        (col("__sv").cast("double") / lit(100.0)).as("stock_value"))
      .orderBy(col("stock_value").desc, col("ps_partkey"))
  }

  private val q126Sql =
    "WITH " + partsuppCte + """,
      |asia AS (SELECT s.s_suppkey FROM supplier s, nation n, region r
      |  WHERE s.s_nationkey = n.n_nationkey
      |    AND n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'),
      |psa AS (SELECT ps.ps_partkey,
      |    ps.ps_supplycost_cents * ps.ps_availqty AS v
      |  FROM partsupp ps JOIN asia ON ps.ps_suppkey = asia.s_suppkey)
      |SELECT ps_partkey, CAST(sum(v) AS DOUBLE) / 100.0 AS stock_value
      |FROM psa GROUP BY ps_partkey
      |HAVING CAST(sum(v) AS DOUBLE) > 0.001 * (
      |  SELECT CAST(sum(v) AS DOUBLE) FROM psa)
      |ORDER BY stock_value DESC, ps_partkey""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship): distinct supplier counts
    * per (brand, type, size) bucket for a size list, excluding one brand,
    * one type, and suppliers in deficit. The exclusion list (negative
    * acctbal) is a broadcast anti-join — the NOT IN of the spec without
    * its null trap; the filtered part dimension broadcasts; the only
    * wide exchange is the distinct-count aggregation itself. */
  private def q127(s: SparkSession, d: String): DataFrame = {
    val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.partsupp(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#17" && col("p_type") =!= "SMALL" &&
            col("p_size").isin(2, 5, 11, 28, 29, 37, 42, 50))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))),
        col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q127Sql =
    "WITH " + partsuppCte + """
      |SELECT p.p_brand, p.p_type, p.p_size,
      |  count(DISTINCT ps.ps_suppkey) AS supplier_cnt
      |FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
      |WHERE p.p_brand <> 'Brand#17' AND p.p_type <> 'SMALL'
      |  AND p.p_size IN (2, 5, 11, 28, 29, 37, 42, 50)
      |  AND ps.ps_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_type, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size"""
      .stripMargin

  /** TPC-H Q20 (potential part promotion): AMERICA suppliers holding
    * more than half a year's shipped quantity of some red part. The
    * correlated quantity subquery decorrelates into a (partkey, suppkey)
    * aggregate left-joined under the availqty comparison; l_quantity is
    * integer-valued so its double sum is order-exact. Red parts and the
    * region dimension broadcast; the semi join keeps each supplier
    * once. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    val redParts = Tables.part(s, d).filter(col("p_name").like("red%"))
      .select(col("p_partkey"))
    val liAgg = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("__qty"))
    val cand = Tables.partsupp(s, d)
      .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
      .join(liAgg,
        col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"), "left")
      .filter(col("ps_availqty").cast("double") >
        lit(0.5) * coalesce(col("__qty"), lit(0.0)))
      .select(col("ps_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q128Sql =
    "WITH " + partsuppCte + """
      |SELECT s.s_name, s.s_acctbal
      |FROM supplier s, nation n, region r
      |WHERE s.s_nationkey = n.n_nationkey
      |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
      |  AND s.s_suppkey IN (
      |    SELECT ps.ps_suppkey FROM partsupp ps
      |    WHERE ps.ps_partkey IN (
      |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |    AND CAST(ps.ps_availqty AS DOUBLE) > 0.5 * (
      |      SELECT coalesce(sum(l.l_quantity), 0.0) FROM lineitem l
      |      WHERE l.l_partkey = ps.ps_partkey
      |        AND l.l_suppkey = ps.ps_suppkey
      |        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      |        AND l.l_shipdate < TIMESTAMP '1998-01-01'))
      |ORDER BY s.s_name""".stripMargin

  /** TPC-H Q6 forecast revenue change: pure scan-side arithmetic — every
    * predicate (date year, discount band, quantity cut) pushes into the
    * parquet scan, then one partial+final aggregate pair; zero joins,
    * zero wide shuffles. With Q6 plus the synthesized-partsupp family
    * (q125-q128 = Q2/Q11/Q16/Q20 over [[graft.Tables.partsupp]]) the
    * suite covers every classic TPC-H shape except Q12, whose shipmode
    * columns the testdata genuinely lacks. */
  private def q121(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  private val q121Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  private def revenue: org.apache.spark.sql.Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q3: unshipped-order revenue for one market segment, top 10.
    * customer (filtered) joins orders on custkey, then lineitem on
    * orderkey; both date filters push into the scans. */
  private def q55(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(revenue), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  private val q55Sql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5: revenue by nation where customer and supplier share the
    * nation, one region, one order-year. region/nation/supplier are
    * explicit broadcasts; the n_nationkey = c_nationkey = s_nationkey
    * chain rides along the fact joins without extra shuffles. */
  private def q56(s: SparkSession, d: String): DataFrame =
    broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val q56Sql =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |  JOIN customer ON c_nationkey = n_nationkey
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q9 shape: revenue by supplier nation and order year for one
    * part type (no partsupp table in the driver set, so revenue stands in
    * for profit). part is the selective probe side; supplier/nation
    * broadcast. */
  private def q57(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).filter(col("p_type") === "PROMO")
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(revenue), 2).as("amount"))
      .orderBy(col("nation"), col("o_year").desc)

  private val q57Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  round(sum(l_extendedprice*(1-l_discount)), 2) AS amount
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_type = 'PROMO'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q17: small-quantity revenue below a correlated per-part
    * average. Written through the SQL entry path on purpose — Catalyst's
    * RewriteCorrelatedScalarSubquery must decorrelate the per-part
    * subquery into one grouped aggregate + equi-join (asserted in
    * PlanSpec: no nested-loop, no per-row subquery execution), which is
    * the difference between O(n) and O(n * parts) at scale. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("q61_lineitem")
    Tables.part(s, d).createOrReplaceTempView("q61_part")
    s.sql("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM q61_lineitem JOIN q61_part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4'
        AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM q61_lineitem l2
          WHERE l2.l_partkey = q61_part.p_partkey)""")
  }

  private val q61Sql =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  /** Runtime bloom-filter join pruning, exercised for real: a selective
    * orders filter builds a bloom filter that Spark injects on lineitem's
    * l_orderkey BEFORE the shuffle, so non-matching fact rows die at the
    * scan instead of riding the exchange — at 100 TB the difference
    * between shuffling the whole fact table and the matching slice
    * (reference analog: classify-before-I/O, 00b:68-74). The confs live in
    * a cloned session so the rewrite fires here (the driver tables are
    * below the default size gates) without polluting other queries' plans;
    * PlanSpec asserts might_contain lands in the optimized plan and the
    * bloom never changes the answer. */
  private def q67(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // broadcast joins don't need runtime filters; force the shuffle join
    // shape this rewrite exists for
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(revenue), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val q67Sql =
    """SELECT o_orderpriority, count(*) AS cnt,
      |  round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_totalprice > 400000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q10 shape: top customers by lost revenue from returned items.
    * Reference Q10 uses a 3-month order window; this uses a half-year
    * window (1996-01..1996-07) for selectivity at the driver's small SFs.
    * The returnflag filter sits on the lineitem scan, the
    * date window on the orders scan; nation broadcasts; the grouped
    * top-20 ends as TakeOrderedAndProject, never a global sort. */
  private def q74(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      // sum exact per-row CENTS (bigint), not doubles: a double sum is
      // order-dependent across engines and one ulp can flip round(_, 2)
      // at a half-cent boundary (it does, on this query's data)
      .agg(round(sum(round(revenue * 100, 0).cast("long")) / 100.0, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q74Sql =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  round(sum(CAST(round(l_extendedprice*(1-l_discount)*100, 0)
      |                 AS BIGINT)) / 100.0, 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q13: customer count by number of orders placed (including
    * zero-order customers via the left join). Two aggregations, both
    * map-side-combinable; the first groups on the join key itself so AQE
    * can fold the shuffle into the join's exchange. */
  private def q75(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q75Sql =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14: promo revenue share for one ship-month — a conditional
    * aggregate over a single selective scan range; both the date filter
    * and the 2-column projection reach the parquet scan. */
  private def q76(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0))) /
          sum(revenue), 4).as("promo_share"))

  private val q76Sql =
    """SELECT round(100.0 *
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) /
      |    sum(l_extendedprice*(1-l_discount)), 4) AS promo_share
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin

  /** TPC-H Q18: large-volume orders — a grouped HAVING over the fact
    * table feeding a semi-join back onto itself plus customer/orders.
    * The qty aggregate groups on l_orderkey, so the join back to
    * lineitem reuses the same hash partitioning (no extra fact
    * shuffle); customers arrive by equi-join after the fact side has
    * already shrunk to qualifying orders. */
  private def q77(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bigOrders = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 160)
    bigOrders
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  private val q77Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 160)
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin

  /** TPC-H Q19: disjunctive bracket join — OR of (brand, size-range,
    * quantity-range) conjuncts. The join key stays a pure equi-join on
    * partkey (the brackets are residual filters), so Catalyst keeps the
    * hash join; the common quantity/size bounds are pushed to the scans
    * as the OR-union envelope. */
  private def q78(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 35)))
      .agg(round(sum(revenue), 2).as("revenue"),
        count(lit(1)).as("cnt"))

  private val q78Sql =
    """SELECT round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
      |  count(*) AS cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
      |       AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
      |       AND l_quantity BETWEEN 20 AND 35)""".stripMargin

  /** TPC-H Q22: dormant high-balance customers — scalar subquery for the
    * positive-balance average (one tiny broadcast row) + anti join
    * against qualifying orders (none above the value threshold: the
    * driver data gives every customer SOME order, so the classic
    * "no orders at all" predicate would be vacuously empty), grouped by
    * market segment. Catalyst plans the anti join as a hash anti on
    * custkey; the average is a separate 1-row aggregate, never
    * correlated. */
  private def q79(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q79Sql =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q4: order counts by priority where at least one line item is
    * large (no l_commitdate in the driver schema, so a quantity
    * predicate stands in for the late-delivery one). Deliberately
    * through the spark.sql PARSER path: Catalyst must rewrite the
    * correlated EXISTS into a left semi join on o_orderkey — never a
    * per-row subquery — which PlanSpec asserts. */
  private def q86(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("q86_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("q86_lineitem")
    s.sql("""SELECT o_orderpriority, count(*) AS order_count
      FROM q86_orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND EXISTS (SELECT 1 FROM q86_lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  private val q86Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 volume shipping: bilateral trade between two nations by
    * ship year. Both nation filters broadcast into supplier/customer, so
    * the only big work is lineitem x orders x customer on their keys; the
    * 2-year shipdate window pushes into the lineitem scan. */
  private def q104(s: SparkSession, d: String): DataFrame = {
    val nations = Tables.nation(s, d)
      .filter(col("n_name").isin("NATION_10", "NATION_12"))
    val supp = Tables.supplier(s, d)
      .join(nations.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(nations.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation")), col("c_nationkey") === col("cnk"))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(revenue), 2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q104Sql =
    """SELECT supp_nation, cust_nation, l_year,
      |  round(sum(volume), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year,
      |    l_extendedprice * (1 - l_discount) AS volume
      |  FROM supplier
      |  JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE n1.n_name IN ('NATION_10', 'NATION_12')
      |    AND n2.n_name IN ('NATION_10', 'NATION_12')
      |    AND n1.n_name <> n2.n_name
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 market share: NATION_3 suppliers' share of AMERICA-region
    * PROMO-part revenue by order year. Eight-table star: part is the
    * selective probe, every dimension (supplier, customer, both nation
    * copies, region) broadcasts; the ratio is computed from the same
    * rounded-sum discipline as the other revenue queries. */
  private def q105(s: SparkSession, d: String): DataFrame = {
    val custRegion = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("nation"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("nation"))
    Tables.part(s, d).filter(col("p_type") === "PROMO")
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("nation") === "NATION_3", revenue).otherwise(lit(0.0))) /
          sum(revenue), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q105Sql =
    """SELECT o_year,
      |  round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
      |        / sum(volume), 6) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    l_extendedprice * (1 - l_discount) AS volume,
      |    n2.n_name AS nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q21 shape: suppliers who shipped LAST on a multi-supplier
    * finished order (no l_receiptdate/l_commitdate in the driver schema,
    * so "latest l_shipdate on the order" stands in for "missed the
    * commit"). The interesting part is the double correlated quantifier —
    * EXISTS another supplier on the order, NOT EXISTS one that shipped
    * later — which Catalyst must decorrelate into a left-semi and a
    * left-anti join on l_orderkey (per-row subqueries would be O(n^2) at
    * scale); the SQL entry path exercises exactly that rewrite. */
  private def q106(s: SparkSession, d: String): DataFrame = {
    Tables.supplier(s, d).createOrReplaceTempView("q106_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("q106_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("q106_orders")
    s.sql("""SELECT s_name, count(*) AS numwait
      FROM q106_supplier
      JOIN q106_lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN q106_orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM q106_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM q106_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name ORDER BY numwait DESC, s_name""")
  }

  private val q106Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate (three
    * brand/size/quantity brackets; no p_container in the driver schema).
    * The disjunction spans both sides of the join, but its
    * per-table residuals (p_brand IN (...), l_quantity <= 30) are still
    * extractable — Catalyst must push those below the join so the scans
    * prune before the equi-join on partkey. */
  private def q107(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(revenue), 2).as("revenue"))

  private val q107Sql =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q15 top supplier: quarterly revenue per supplier, keep the
    * max. Revenue is rounded BEFORE the max-equality so the comparison is
    * stable across engines; the 1-row max broadcasts back over the tiny
    * aggregated side (never the fact table). */
  private def q108(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(revenue), 2).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mr"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(top))
      .filter(col("total_revenue") === col("mr"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q108Sql =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin
}

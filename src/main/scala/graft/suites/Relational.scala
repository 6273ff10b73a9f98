package graft.suites

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.2–2.7 generic ops):
  * scan/filter/project with pushdown, equi/semi/anti/outer/cross/theta
  * joins, group-by aggregation, rollup, windows, set ops, top-k.
  *
  * Every query is deterministic (explicit orderBy + rounded float
  * aggregates) so the driver's DuckDB hash-compare is stable. Float sums
  * are rounded AFTER aggregation; single-row arithmetic is bit-identical
  * across engines so it needs no rounding.
  *
  * Scale notes (100 TB design intent, tested at sf0.1):
  *  - dimension joins (region/nation/buckets) are explicitly broadcast;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key and are
  *    AQE-coalesced; no driver-side collects anywhere;
  *  - aggregates are partial (map-side combine) by construction.
  */
object Relational {

  // lazy: the q*Sql vals below are initialized after this field otherwise
  lazy val all: Seq[Q] = Seq(
    Q("q01_agg_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_project_pushdown", q02, Some(q02Sql)),
    Q("q03_join_broadcast_dims", q03, Some(q03Sql)),
    Q("q04_join_shuffle_large", q04, Some(q04Sql)),
    Q("q05_semi_join_exists", q05, Some(q05Sql)),
    Q("q06_anti_join_not_exists", q06, Some(q06Sql)),
    Q("q07_left_join_count", q07, Some(q07Sql)),
    Q("q08_full_outer_join", q08, Some(q08Sql)),
    Q("q09_cross_join", q09, Some(q09Sql)),
    Q("q10_range_theta_join", q10, Some(q10Sql)),
    Q("q11_window_topk_per_group", q11, Some(q11Sql)),
    Q("q12_window_running_lag", q12, Some(q12Sql)),
    Q("q13_distinct_order", q13, Some(q13Sql)),
    Q("q14_set_union_intersect_except", q14, Some(q14Sql)),
    Q("q15_orderby_limit_topk", q15, Some(q15Sql)),
    Q("q71_binned_interval_join", q71, Some(q71Sql)),
    Q("q88_merge_upsert", q88, Some(q88Sql)),
    Q("q95_interval_overlap_join", q95, Some(q95Sql)),
    Q("q96_fuzzy_edit1_join", q96, Some(q96Sql)),
    Q("q118_global_ids", q118, Some(q118Sql)),
    Q("q120_table_checksum", q120, Some(q120Sql)),
    Q("q131_orc_roundtrip", q131, Some(q131Sql)),
    Q("q137_salted_join", q137, Some(q137Sql)),
    Q("q166_bucketed_join", q166, Some(q137Sql)),
    Q("q138_join_cardinality", q138, Some(q138Sql)),
    Q("q139_column_profile", q139, Some(q139Sql)),
    Q("q146_column_profile_approx", q146, Some(q146Sql))
  )

  /** Sketch-based column profiling
    * ([[graft.ops.Profile.numericProfileApprox]]): the warehouse-scale
    * ANALYZE pass — per column, value/null counts, the min-max
    * envelope, and an HLL-estimated distinct count, ALL from one
    * aggregation job with NO Expand and no per-column distinct shuffle
    * (q139's exact profile pays both). Each column's sketch is the
    * q112 portable HLL folded as a typed Aggregator buffer, so the
    * oracle replays every sketch bit-for-bit — a wrong bucket, rho, or
    * merge breaks the hash. */
  private def q146(s: SparkSession, d: String): DataFrame =
    graft.ops.Profile.numericProfileApprox(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_quantity", "l_suppkey"))
      .orderBy(col("col_name"))

  private val q146Sql = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name,
         |  CAST(count($c) AS BIGINT) AS n_values,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  (SELECT round(CAST(0.709436 AS DOUBLE) * CAST(4096 AS DOUBLE)
         |       * CAST(1073741824 AS DOUBLE) /
         |       (sum(1::BIGINT << CAST(30 - mj AS INT))
         |         + (64 - count(*)) * (1::BIGINT << 30)), 2)
         |   FROM (
         |     SELECT h % 64 AS bucket,
         |       max(CASE WHEN h // 64 = 0 THEN 25
         |           ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1
         |           END) AS mj
         |     FROM (SELECT ((h1 + h1 // 8192) * 468703703) % 1000000007 AS h
         |           FROM (SELECT ((h0 + h0 // 8192) * 972663749)
         |                     % 1000000007 AS h1
         |                 FROM (SELECT ((CAST(trunc(CAST($c AS DOUBLE))
         |                           AS BIGINT) % 1000000007) * 2654435761)
         |                           % 1000000007 AS h0
         |                       FROM lineitem
         |                       WHERE $c IS NOT NULL) t0) t1) t2
         |     GROUP BY bucket) s) AS n_distinct_est,
         |  CAST(min($c) AS DOUBLE) AS min_v,
         |  CAST(max($c) AS DOUBLE) AS max_v
         |FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_quantity", "l_suppkey")
      .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY col_name")
  }

  /** Exact join-cardinality prediction
    * ([[graft.ops.Cardinality.joinCardinality]]): the output row count
    * of an equi-join computed from two distinct-key-sized count tables
    * — the fail-fast pre-check `guardedJoin` runs before letting a
    * skewed or mis-keyed join melt the cluster. The query surfaces the
    * prediction NEXT TO the actual join count; the oracle computes
    * both, so any divergence between the predictor and reality breaks
    * the hash. */
  private def q138(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"))
    graft.ops.Cardinality.joinCardinality(li, o, "l_orderkey")
      .crossJoin(li.join(o, Seq("l_orderkey"))
        .agg(count(lit(1)).as("actual_rows")))
  }

  private val q138Sql =
    """SELECT
      |  (SELECT CAST(COALESCE(sum(ln * rn), 0) AS BIGINT) FROM
      |    (SELECT l_orderkey AS k, count(*) AS ln
      |     FROM lineitem GROUP BY 1) a
      |    JOIN (SELECT o_orderkey AS k, count(*) AS rn
      |          FROM orders GROUP BY 1) b USING (k)) AS join_rows,
      |  (SELECT count(*) FROM lineitem
      |   JOIN orders ON l_orderkey = o_orderkey) AS actual_rows""".stripMargin

  /** One-pass column profiling ([[graft.ops.Profile.numericProfile]]):
    * the ANALYZE TABLE statistics surface — per column, value/null/
    * distinct counts and the min-max envelope from a single partially-
    * aggregated job, pivoted to stats rows. */
  private def q139(s: SparkSession, d: String): DataFrame =
    graft.ops.Profile.numericProfile(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_name"))

  private val q139Sql = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name,
         |  CAST(count($c) AS BIGINT) AS n_values,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_v,
         |  CAST(max($c) AS DOUBLE) AS max_v
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(one).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY col_name")
  }

  /** Salted equi-join ([[graft.ops.Skew.saltedJoin]]): the big side
    * salts each row into one of 8 buckets and the mid-size side
    * replicates per salt, so a hot join key spreads over 8 reducers —
    * the manual form of AQE's skew split, composable when AQE cannot
    * see the skew. The oracle is the PLAIN join: salting must be
    * result-invisible. */
  private def q137(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.ops.Skew.saltedJoin(li, o, "l_orderkey", buckets = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  private val q137Sql =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val bucketedTables =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Bucketed co-located fact-fact join ([[graft.ops.Bucketing]]): the
    * two fact slices are each written ONCE per corpus as bucketed
    * managed tables on the join key (8 buckets, sorted within buckets),
    * and every subsequent equi-join reads co-located buckets with NO
    * shuffle exchange on either side (asserted in BucketingSpec /
    * PlanSpec) — the pre-shuffle-once pattern for repeated fact-fact
    * joins at 100 TB. Same aggregate and same PLAIN-join oracle as
    * q137: the physical layout must be result-invisible, and the two
    * queries cross-check each other against one oracle. */
  private def q166(s: SparkSession, d: String): DataFrame = {
    val (to, tl) = bucketedTables.getOrElseUpdate(d, {
      // table names must be identifier-safe AND collision-free per
      // corpus dir (String.hashCode collisions would silently repoint
      // one corpus's cached tables at another's data): digest the dir
      val sfx = java.security.MessageDigest.getInstance("SHA-1")
        .digest(d.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString
      val ot = s"g_bkt_orders_$sfx"
      val lt = s"g_bkt_lineitem_$sfx"
      graft.ops.Bucketing.writeBucketed(
        Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select(col("o_orderkey").as("okey"), col("o_orderpriority")),
        ot, "okey", 8)
      graft.ops.Bucketing.writeBucketed(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("okey"), col("l_quantity")),
        lt, "okey", 8)
      (ot, lt)
    })
    graft.ops.Bucketing.bucketedJoin(s, to, tl, "okey")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  /** ORC sink + source round-trip (SURVEY §2.1 interchange formats
    * beyond parquet/CSV/JSON): a lineitem slice is written to ORC, read
    * back through the ORC scan — where the quantity predicate pushes
    * down, asserted by FormatsSpec — and aggregated integer-exactly
    * (quantities are integral doubles; prices aggregate as rounded
    * cents), so the oracle over the PARQUET source of truth hashes
    * identically iff the ORC round-trip was lossless. DuckDB cannot
    * read ORC, which is exactly why the query is shaped so the parquet
    * oracle still fully checks it. */
  private def q131(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag")
      .write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .filter(col("l_quantity") > 25.0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100.0).cast("long"))
          .as("sum_price_cents"))
      .orderBy(col("l_returnflag"))
  }

  private val q131Sql =
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
      |    AS sum_price_cents
      |FROM lineitem WHERE l_quantity > 25.0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Order-independent table checksum ([[graft.ops.Checksum
    * .tableChecksum]]): sum of per-row portable avalanche hashes — the
    * run-on-both-engines-and-compare-one-row migration validation this
    * library's own oracle gate performs per query. Commutative integer
    * addition makes it partitioning/order/merge-shape independent. */
  private def q120(s: SparkSession, d: String): DataFrame =
    graft.ops.Checksum.tableChecksum(Tables.lineitem(s, d),
      col("l_orderkey") * 131L + col("l_linenumber"))

  private val q120Sql =
    """WITH h0 AS (SELECT ((l_orderkey * 131 + l_linenumber) % 1000000007)
      |    * 2654435761 % 1000000007 AS h FROM lineitem),
      |h1 AS (SELECT ((h + h // 8192) * 972663749) % 1000000007 AS h FROM h0),
      |h AS (SELECT ((h + h // 8192) * 468703703) % 1000000007 AS h FROM h1)
      |SELECT count(*) AS n_rows, CAST(sum(h) AS BIGINT) AS checksum
      |FROM h""".stripMargin

  /** Scalable global ID assignment ([[graft.ops.Ids.assignIds]]):
    * contiguous 0-based ids in (l_extendedprice, l_orderkey, l_linenumber)
    * order WITHOUT the single-partition window a bare
    * `row_number() over (order by ...)` plans — range repartition + the
    * count-and-offset pass keep every stage distributed. The oracle is
    * the semantic definition: the global row_number minus one. */
  private def q118(s: SparkSession, d: String): DataFrame =
    graft.ops.Ids.assignIds(
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"))
      .orderBy(col("id"))

  private val q118Sql =
    """SELECT row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
      |    l_linenumber) - 1 AS id,
      |  l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem WHERE l_quantity >= 45
      |ORDER BY id""".stripMargin

  /** Interval x interval OVERLAP join ([[graft.ops.RangeJoin
    * .intervalOverlap]]): 10-minute activity windows opened by clicks
    * against 10-minute windows opened by purchases of the SAME user.
    * Both sides bin onto a 600 s grid and meet on an equi-key
    * (bin, user); each overlapping pair is emitted from exactly one bin
    * (the overlap's first), so there is no dedup shuffle at all. The
    * oracle replays the overlap semantics as a direct theta join. */
  private def q95(s: SparkSession, d: String): DataFrame = {
    def windows(t: String, pre: String) = Tables.events(s, d)
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${pre}_event"), col("user_id"),
        col("ts").as(s"${pre}_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as(s"${pre}_end"))
    graft.ops.RangeJoin.intervalOverlap(
        windows("click", "a"), "a_start", "a_end",
        windows("purchase", "b"), "b_start", "b_end",
        keys = Seq("user_id"), binSeconds = 600)
      .select(col("user_id"), col("a_event"), col("b_event"),
        (unix_micros(least(col("a_end"), col("b_end"))) -
          unix_micros(greatest(col("a_start"), col("b_start"))))
          .as("overlap_us"))
      .orderBy(col("user_id"), col("a_event"), col("b_event"))
  }

  private val q95Sql =
    """WITH a AS (SELECT event_id AS a_event, user_id,
      |    ts AS a_start, ts + INTERVAL 10 MINUTE AS a_end
      |  FROM events WHERE event_type = 'click'),
      |b AS (SELECT event_id AS b_event, user_id,
      |    ts AS b_start, ts + INTERVAL 10 MINUTE AS b_end
      |  FROM events WHERE event_type = 'purchase')
      |SELECT a.user_id, a_event, b_event,
      |  epoch_us(least(a_end, b_end)) -
      |    epoch_us(greatest(a_start, b_start)) AS overlap_us
      |FROM a JOIN b ON a.user_id = b.user_id
      |  AND a_start < b_end AND b_start < a_end
      |ORDER BY a.user_id, a_event, b_event""".stripMargin

  /** Typo-tolerant catalog matching ([[graft.ops.Fuzzy
    * .editDistance1Join]]): every tenth part name gains a deterministic
    * one-character deletion (position keyed by the part key) and is
    * matched back against the full catalog at Levenshtein distance <= 1
    * through the hashed deletion-neighborhood equi-join — never a cross
    * join. The oracle brute-forces levenshtein over probes x catalog. */
  private def q96(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d).select(col("p_partkey"), col("p_name"))
    val pos = pmod(col("p_partkey"), length(col("p_name"))) + 1
    val probes = parts.filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("probe_key"),
        concat(col("p_name").substr(lit(1), pos - 1),
          col("p_name").substr(pos + 1,
            greatest(length(col("p_name")) - pos, lit(0))))
          .as("probe_name"))
    graft.ops.Fuzzy.editDistance1Join(
        probes, "probe_key", "probe_name", parts, "p_partkey", "p_name")
      .orderBy(col("probe_key"), col("p_partkey"))
  }

  private val q96Sql =
    """WITH probes AS (
      |  SELECT p_partkey AS probe_key,
      |    substr(p_name, 1, pos - 1) ||
      |      substr(p_name, pos + 1, length(p_name) - pos) AS probe_name
      |  FROM (SELECT p_partkey, p_name,
      |          (p_partkey % length(p_name)) + 1 AS pos FROM part)
      |  WHERE p_partkey % 10 = 0)
      |SELECT probe_key, probe_name, p_partkey, p_name,
      |  CAST(levenshtein(probe_name, p_name) AS INT) AS dist
      |FROM probes JOIN part ON levenshtein(probe_name, p_name) <= 1
      |ORDER BY probe_key, p_partkey""".stripMargin

  /** Point-in-interval join WITHOUT a nested loop: lineitem ship dates
    * against the 7-day windows of high-value orders, via ops.RangeJoin's
    * fixed-width binning — both sides meet on an integer bin key
    * (equi-join, shuffle partitionable), and the exact [start, end)
    * predicate runs only on per-bin candidates. The naive theta join
    * would be a broadcast nested loop over every (lineitem, window)
    * pair — O(n*m) that dies when neither side is tiny.
    *
    * Since only counts survive, the count is pushed BELOW the expanding
    * join: lineitem pre-aggregates per ship date (~2.5k rows at sf0.1
    * instead of 600k), the interval join matches dates to windows, and
    * the final sum re-expands — 25M matched pairs become ~100k without
    * changing the answer. The same partial-agg-below-expand-join shape is
    * what keeps this query alive at 100 TB. */
  private def q71(s: SparkSession, d: String): DataFrame = {
    val windows = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey").as("w_orderkey"),
        col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
    val byDate = Tables.lineitem(s, d)
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("date_cnt"))
    graft.ops.RangeJoin.pointInInterval(
        byDate, "l_shipdate", windows, "w_start", "w_end")
      .groupBy(col("w_orderkey"))
      .agg(sum(col("date_cnt")).as("n_shipped_in_window"))
      .orderBy(col("w_orderkey"))
  }

  private val q71Sql =
    """SELECT o_orderkey AS w_orderkey, count(*) AS n_shipped_in_window
      |FROM lineitem JOIN (
      |  SELECT o_orderkey, o_orderdate AS ws,
      |    o_orderdate + INTERVAL 7 DAY AS we
      |  FROM orders WHERE o_totalprice > 450000) w
      |  ON l_shipdate >= ws AND l_shipdate < we
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q1-style grouped pricing summary (SURVEY §2.4 A1/A5 analog). */
  private def q01(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective filter + narrow projection; both must reach the parquet scan
    * (SURVEY §2.2 P5/P8: PushedFilters + pruned ReadSchema). */
  private def q02(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_discount") >= 0.05 && col("l_quantity") < 5)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // no rounding: a single IEEE multiply is bit-identical across
        // engines, while rounding 2dp*2dp products hits .xx5 half-boundaries
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice * (1 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_discount >= 0.05 AND l_quantity < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join: fact ⋈ broadcast dimension chain (SURVEY §2.3 J3). */
  private def q03(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d); val c = Tables.customer(s, d)
    val n = Tables.nation(s, d); val r = Tables.region(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("total_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"))
  }

  private val q03Sql =
    """SELECT r_name, round(sum(o_totalprice), 2) AS total_revenue,
      | count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Fact-fact shuffle join on the order key (SURVEY §2.3 generic). */
  private def q04(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS n_lines,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left-semi join = EXISTS (SURVEY §2.3). */
  private def q05(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q05Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join = NOT EXISTS; the reference's resume pattern
    * (SURVEY §2.3 J1/J4). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Left outer join preserving zero-order customers (SURVEY §2.3). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
      .orderBy(col("c_custkey"))
  }

  private val q07Sql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      | round(coalesce(sum(o_totalprice), 0), 2) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Full outer join of two aggregated sides (SURVEY §2.3). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    val cs = Tables.customer(s, d).filter(col("c_acctbal") < 0)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val ss = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    cs.join(ss, cs("c_nationkey") === ss("s_nationkey"), "full_outer")
      .select(
        coalesce(cs("c_nationkey"), ss("s_nationkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  private val q08Sql =
    """WITH cs AS (SELECT c_nationkey, count(*) AS n_cust FROM customer
      |            WHERE c_acctbal < 0 GROUP BY c_nationkey),
      |     ss AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier
      |            WHERE s_acctbal < 0 GROUP BY s_nationkey)
      |SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |       coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM cs FULL JOIN ss ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Cross join of two small relations (SURVEY §2.3 J2 settings-grid
    * analog). */
  private def q09(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val st = Tables.orders(s, d).select(col("o_orderstatus")).distinct()
    r.crossJoin(st)
      .select(col("r_name"), col("o_orderstatus"))
      .orderBy(col("r_name"), col("o_orderstatus"))
  }

  private val q09Sql =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
      |ORDER BY r_name, o_orderstatus""".stripMargin

  /** Theta (range-predicate) join against a broadcast literal bucket dim
    * (SURVEY §2.3 theta; the scale pattern for banded joins). */
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val buckets = Seq(
      ("p00_low", 0.0, 1000.0),
      ("p01_mid", 1000.0, 1500.0),
      ("p02_high", 1500.0, 1e12)).toDF("bucket", "lo", "hi")
    Tables.part(s, d)
      .join(broadcast(buckets),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("bucket"))
  }

  private val q10Sql =
    """SELECT bucket, count(*) AS n_parts,
      | round(avg(p_retailprice), 4) AS avg_price
      |FROM part JOIN (VALUES ('p00_low', 0.0, 1000.0),
      |                       ('p01_mid', 1000.0, 1500.0),
      |                       ('p02_high', 1500.0, 1e12)) b(bucket, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** row_number window: top-3 orders per customer (SURVEY §2.5). */
  private def q11(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q11Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Running aggregate + lag over an ordered per-user event stream
    * (SURVEY §2.5 window surface). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(
        col("user_id"), col("event_id"),
        round(sum(col("value"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_value"),
        lag(col("event_id"), 1).over(w).as("prev_event"),
        lead(col("event_id"), 1).over(w).as("next_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val q12Sql =
    """SELECT user_id, event_id,
      | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
      |   AS running_value,
      | lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |   AS prev_event,
      | lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |   AS next_event
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Distinct + sort (SURVEY §2.4 A3/A4). */
  private def q13(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_mktsegment")).distinct().orderBy(col("c_mktsegment"))

  private val q13Sql =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** Set ops: symmetric difference via union/intersect/except
    * (SURVEY §2.6). */
  private def q14(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val b = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
      .select(col("o_custkey").as("c_custkey")).distinct()
    a.union(b).distinct()
      .except(a.intersect(b))
      .orderBy(col("c_custkey"))
  }

  private val q14Sql =
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
      |     b AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
      |           WHERE o_totalprice > 200000)
      |(SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
      |EXCEPT
      |(SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
      |ORDER BY c_custkey""".stripMargin

  /** Global top-k: Spark plans TakeOrderedAndProject (SURVEY §2.5). */
  private def q15(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val q15Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** MERGE INTO emulation (SCD-1 upsert) as one full-outer join +
    * per-column coalesce: a deterministic update set (every 7th customer
    * gets a balance bump; every 13th arrives as a brand-new row) merges
    * into the customer snapshot — matched rows take the update's values,
    * unmatched keep the target's, inserts pass through. This is the
    * batch-upsert primitive behind Delta/Iceberg MERGE, expressed so the
    * whole operation is ONE key shuffle (both sides hash on custkey) and
    * the output is a complete new snapshot, suitable for
    * write-partitioned replacement at 100 TB. */
  private def q88(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val updates = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("u_custkey"),
        col("c_name").as("u_name"),
        round(col("c_acctbal") + 100.0, 2).as("u_acctbal"),
        col("c_mktsegment").as("u_mktsegment"))
      // insert keys offset by 10M: customer holds 150k rows per unit SF,
      // so the synthetic keys stay collision-free up to SF ~66 (a plain
      // +100k offset would collide with real custkeys from SF 0.7)
      .unionByName(cust.filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 10000000L).as("u_custkey"),
          concat(col("c_name"), lit("_new")).as("u_name"),
          lit(0.0).as("u_acctbal"),
          lit("MACHINERY").as("u_mktsegment")))
    cust.join(updates, col("c_custkey") === col("u_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("u_custkey")).as("c_custkey"),
        coalesce(col("u_name"), col("c_name")).as("c_name"),
        round(coalesce(col("u_acctbal"), col("c_acctbal")), 2)
          .as("c_acctbal"),
        coalesce(col("u_mktsegment"), col("c_mktsegment"))
          .as("c_mktsegment"),
        when(col("c_custkey").isNull, lit("insert"))
          .when(col("u_custkey").isNull, lit("keep"))
          .otherwise(lit("update")).as("merge_action"))
      .orderBy(col("c_custkey"))
  }

  private val q88Sql =
    """WITH updates AS (
      |  SELECT c_custkey AS u_custkey, c_name AS u_name,
      |    round(c_acctbal + 100.0, 2) AS u_acctbal,
      |    c_mktsegment AS u_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name || '_new', 0.0, 'MACHINERY'
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT
      |  coalesce(c_custkey, u_custkey) AS c_custkey,
      |  coalesce(u_name, c_name) AS c_name,
      |  round(coalesce(u_acctbal, c_acctbal), 2) AS c_acctbal,
      |  coalesce(u_mktsegment, c_mktsegment) AS c_mktsegment,
      |  CASE WHEN c_custkey IS NULL THEN 'insert'
      |       WHEN u_custkey IS NULL THEN 'keep'
      |       ELSE 'update' END AS merge_action
      |FROM customer FULL OUTER JOIN updates ON c_custkey = u_custkey
      |ORDER BY 1""".stripMargin
}

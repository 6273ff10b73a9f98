package graft.suites

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic operator surface: statistical aggregates, rollup/cube grouping
  * sets, scalar string/date/null/JSON functions, scalar subqueries,
  * sessionization and time-bucket aggregation over the event stream
  * (SURVEY.md §2.4–2.7 generic coverage).
  */
object Analytic {

  lazy val all: Seq[Q] = Seq(
    Q("q16_agg_stats", q16, Some(q16Sql)),
    Q("q17_rollup", q17, Some(q17Sql)),
    Q("q18_cube", q18, Some(q18Sql)),
    Q("q19_string_funcs", q19, Some(q19Sql)),
    Q("q20_date_funcs", q20, Some(q20Sql)),
    Q("q21_null_handling", q21, Some(q21Sql)),
    Q("q23_scalar_subquery", q23, Some(q23Sql)),
    Q("q24_sessionize", q24, Some(q24Sql)),
    Q("q25_time_bucket", q25, Some(q25Sql)),
    Q("q26_json_extract", q26, Some(q26Sql)),
    Q("q27_pivot", q27, Some(q27Sql)),
    Q("q28_unpivot", q28, Some(q28Sql)),
    Q("q42_salted_agg", q42, Some(q42Sql)),
    Q("q43_asof_join", q43, Some(q43Sql)),
    Q("q29_grouping_sets", q29, Some(q29Sql)),
    Q("q45_percentiles", q45, Some(q45Sql)),
    Q("q46_range_window", q46, Some(q46Sql)),
    Q("q51_corr_stats", q51, Some(q51Sql)),
    Q("q52_string_agg", q52, Some(q52Sql)),
    Q("q59_custom_udaf_geomean", q59, Some(q59Sql)),
    Q("q62_hopping_window", q62, Some(q62Sql)),
    Q("q63_session_window", q63, Some(q63Sql)),
    Q("q64_argmax_per_group", q64, Some(q64Sql)),
    Q("q65_topk_aggregator", q65, Some(q65Sql)),
    Q("q83_rank_functions", q83, Some(q83Sql)),
    Q("q85_gap_fill", q85, Some(q85Sql)),
    Q("q99_incremental_agg", q99, Some(q99Sql)),
    Q("q112_hll_distinct", q112, Some(q112Sql)),
    Q("q114_funnel", q114, Some(q114Sql)),
    Q("q115_binned_quantiles", q115, Some(q115Sql)),
    Q("q117_hll_by_key", q117, Some(q117Sql)),
    Q("q122_cohort_retention", q122, Some(q122Sql)),
    Q("q124_winsorize", q124, Some(q124Sql))
  )

  /** Per-group winsorization ([[graft.ops.Robust.winsorizeSummary]]):
    * prices clamp into their per-returnflag binned [p01, p99] quantile
    * band — bounds from a 4096-bin histogram over the price domain
    * (O(groups x bins) aggregation state, never the exact percentile's
    * O(group-data) buffer), broadcast back over the fact table so fact
    * rows never shuffle for the clamp. Clip counts are exact integers,
    * and the winsorized mean goes through an integer-scaled sum so the
    * aggregate is order- and engine-independent — the final division is
    * the only floating-point step. The oracle replays the ENTIRE bound
    * derivation (histogram, per-group CDF, edge arithmetic) in identical
    * IEEE doubles, the q115 discipline. */
  private def q124(s: SparkSession, d: String): DataFrame =
    graft.ops.Robust.winsorizeSummary(Tables.lineitem(s, d),
        "l_returnflag", "l_extendedprice", lo = 0.01, hi = 0.99,
        binLo = 900.0, binHi = 105000.0, bins = 4096)
      .orderBy(col("l_returnflag"))

  private val q124Sql =
    """WITH h AS (SELECT l_returnflag AS k,
      |    least(4095, greatest(0, CAST(floor(
      |      (l_extendedprice - 900.0) / ((105000.0 - 900.0) / 4096))
      |      AS BIGINT))) AS bin,
      |    count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT k, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY k ORDER BY bin) AS cum,
      |    sum(cnt) OVER (PARTITION BY k) AS n
      |  FROM h),
      |b AS (SELECT k,
      |    900.0 + min(CASE WHEN cum >= 0.01 * n THEN bin END)
      |      * ((105000.0 - 900.0) / 4096) AS plo,
      |    900.0 + (min(CASE WHEN cum >= 0.99 * n THEN bin END) + 1)
      |      * ((105000.0 - 900.0) / 4096) AS phi
      |  FROM c GROUP BY k),
      |j AS (SELECT l.l_returnflag AS k, l.l_extendedprice AS v,
      |    b.plo, b.phi,
      |    least(greatest(l.l_extendedprice, b.plo), b.phi) AS w
      |  FROM lineitem l JOIN b ON l.l_returnflag = b.k)
      |SELECT k AS l_returnflag,
      |  round(min(plo), 4) AS p_lo,
      |  round(min(phi), 4) AS p_hi,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN v < plo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_lo,
      |  CAST(sum(CASE WHEN v > phi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clip_hi,
      |  round(CAST(sum(CAST(round(w * 10000) AS BIGINT)) AS DOUBLE)
      |    / 10000.0 / count(*), 4) AS win_mean
      |FROM j GROUP BY k ORDER BY l_returnflag""".stripMargin

  /** Cohort retention: users grouped by first-active day, retention
    * counted as distinct users active again k days later. Two keyed
    * aggregations (first-seen per user; distinct user-days) meeting in
    * one equi-join on the user key, then a count rollup per (cohort,
    * offset) — the fact table never joins itself, and every stage
    * partial-aggregates. day_offset 0 is the cohort size row, so the
    * output is self-normalizing. */
  private def q122(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val userDays = ev.dropDuplicates("user_id", "day")
    userDays.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      // DATE surfaces as object vs datetime64 across engines — ship as
      // timestamp (the oracle casts identically)
      .select(col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  private val q122Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort FROM ev
      |  GROUP BY user_id),
      |ud AS (SELECT DISTINCT user_id, day FROM ev)
      |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
      |  CAST(day - cohort AS BIGINT) AS day_offset,
      |  count(DISTINCT user_id) AS n_users
      |FROM ud JOIN cohorts USING (user_id)
      |GROUP BY cohort, day_offset
      |ORDER BY cohort, day_offset""".stripMargin

  /** Per-group HLL cardinality profile
    * ([[graft.ops.Sketches.hllDistinctByKey]]): estimated distinct users
    * per event type. The shuffle carries at most 64 sketch rows per
    * (partition, group) — the per-key profiling shape that replaces a
    * count(distinct) per group at corpus scale. Oracle replays the full
    * per-group sketch. */
  private def q117(s: SparkSession, d: String): DataFrame =
    graft.ops.Sketches.hllDistinctByKey(Tables.events(s, d),
      "user_id", "event_type")
      .orderBy(col("event_type"))

  private val q117Sql =
    """WITH h0 AS (SELECT event_type,
      |    ((user_id % 1000000007) * 2654435761) % 1000000007 AS h
      |  FROM events),
      |h1 AS (SELECT event_type,
      |    ((h + h // 8192) * 972663749) % 1000000007 AS h FROM h0),
      |h AS (SELECT event_type,
      |    ((h + h // 8192) * 468703703) % 1000000007 AS h FROM h1),
      |b AS (SELECT event_type, h % 64 AS bucket, h // 64 AS w FROM h),
      |r AS (SELECT event_type, bucket,
      |    CASE WHEN w = 0 THEN 25
      |         ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM b),
      |s AS (SELECT event_type, bucket, max(rho) AS mj FROM r
      |  GROUP BY event_type, bucket),
      |t AS (SELECT event_type,
      |    sum(1::BIGINT << CAST(30 - mj AS INT))
      |      + (64 - count(*)) * (1::BIGINT << 30) AS s_scaled
      |  FROM s GROUP BY event_type)
      |SELECT event_type,
      |  round(CAST(0.709436 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(1073741824 AS DOUBLE) / s_scaled, 2) AS est_distinct
      |FROM t ORDER BY event_type""".stripMargin

  /** Ordered funnel ([[graft.ops.Funnel.funnelCounts]]): users completing
    * signup -> click -> view -> purchase with each step strictly after
    * their first qualifying previous step. Each stage filters the event
    * table by type BEFORE any shuffle and joins the one-row-per-user
    * frontier; the oracle chains the same min-after joins. */
  private def q114(s: SparkSession, d: String): DataFrame =
    graft.ops.Funnel.funnelCounts(Tables.events(s, d),
      Seq("signup", "click", "view", "purchase"))
      .orderBy(col("step"))

  private val q114Sql =
    """WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
      |  WHERE e.event_type = 'view' GROUP BY e.user_id),
      |t4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN t3 ON e.user_id = t3.user_id AND e.ts > t3.t
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
      |  (SELECT count(*) FROM t1) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
      |UNION ALL SELECT 3, 'view', (SELECT count(*) FROM t3)
      |UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM t4)
      |ORDER BY step""".stripMargin

  /** Mergeable fixed-bin quantile sketch
    * ([[graft.ops.Sketches.binnedQuantiles]]) over l_extendedprice: the
    * shuffle carries at most 1100 bin rows per partition instead of the
    * global sort an exact percentile needs; every arithmetic step is the
    * identical IEEE expression in both engines. */
  private def q115(s: SparkSession, d: String): DataFrame =
    graft.ops.Sketches.binnedQuantiles(Tables.lineitem(s, d),
      "l_extendedprice", lo = 0.0, hi = 110000.0, bins = 1100,
      qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      .orderBy(col("q"))

  private val q115Sql =
    """WITH h AS (SELECT least(1099, greatest(0,
      |    CAST(floor((l_extendedprice - CAST(0.0 AS DOUBLE))
      |      / CAST(100.0 AS DOUBLE)) AS BIGINT))) AS bin FROM lineitem),
      |g AS (SELECT bin, count(*) AS cnt FROM h GROUP BY bin),
      |c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
      |    sum(cnt) OVER () AS n FROM g),
      |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q)
      |SELECT q, min(bin) AS bin,
      |  CAST(0.0 AS DOUBLE) + (min(bin) + 1) * CAST(100.0 AS DOUBLE) AS est
      |FROM qs JOIN c ON cum >= q * n
      |GROUP BY q ORDER BY q""".stripMargin

  /** Engine-portable HyperLogLog cardinality sketch
    * ([[graft.ops.Sketches.hllDistinct]]): estimated vs exact distinct
    * l_partkey count. All sketch arithmetic is integer (portable hash,
    * trailing-zero rho via bit_count, integer-scaled harmonic sum); the
    * single final division is the only floating-point step, so the DuckDB
    * oracle replays the whole sketch bit-for-bit — the 64-row
    * groupBy(bucket).max IS the mergeable-sketch shuffle a 100 TB
    * profiling pass would run. */
  private def q112(s: SparkSession, d: String): DataFrame =
    graft.ops.Sketches.hllDistinct(Tables.lineitem(s, d), "l_partkey")

  private val q112Sql =
    """WITH h0 AS (SELECT ((l_partkey % 1000000007) * 2654435761)
      |    % 1000000007 AS h FROM lineitem),
      |h1 AS (SELECT ((h + h // 8192) * 972663749) % 1000000007 AS h FROM h0),
      |h AS (SELECT ((h + h // 8192) * 468703703) % 1000000007 AS h FROM h1),
      |b AS (SELECT h % 64 AS bucket, h // 64 AS w FROM h),
      |r AS (SELECT bucket,
      |    CASE WHEN w = 0 THEN 25
      |         ELSE bit_count((w & -w) - 1) + 1 END AS rho FROM b),
      |s AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY bucket),
      |t AS (SELECT sum(1::BIGINT << CAST(30 - mj AS INT))
      |    + (64 - count(*)) * (1::BIGINT << 30) AS s_scaled FROM s),
      |e AS (SELECT round(CAST(0.709436 AS DOUBLE) * CAST(4096 AS DOUBLE)
      |    * CAST(1073741824 AS DOUBLE) / s_scaled, 2) AS est_distinct FROM t),
      |x AS (SELECT count(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
      |SELECT est_distinct, exact_distinct,
      |  round(abs(est_distinct - exact_distinct) / exact_distinct, 4)
      |    AS rel_err
      |FROM e CROSS JOIN x""".stripMargin

  /** Incremental materialized-aggregate maintenance: the per-user
    * aggregate state (count, sum, max) is a commutative monoid, so
    * merging a BASE state (events before the cutover) with a DELTA
    * state (the new partition) must equal the full recompute — which is
    * exactly what the oracle computes directly. This is the
    * table-granular version of the reference's incremental rerun
    * discipline (01b skip-if-exists): at 100 TB only the delta
    * shuffles on refresh; the base state is a materialized table the
    * merge reads back. avg is NOT merged as a state — it reconstructs
    * from sum/count after the merge (the classic decomposable-agg
    * rewrite). */
  private def q99(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      // exact integer micro-units: the state sums stay order-independent
      // (a float sum would differ from the recompute in the last ulp
      // depending on merge order — the q85 discipline)
      .withColumn("v_us", round(col("value") * 1e6, 0).cast("long"))
    val cut = lit("2024-01-24").cast("timestamp")
    def state(df: DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("v_us")).as("sv_us"),
        max(col("ts")).as("mts"))
    state(ev.filter(col("ts") < cut))
      .unionByName(state(ev.filter(col("ts") >= cut)))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        (sum(col("sv_us")).cast("double") / 1e6).as("total_value"),
        (sum(col("sv_us")).cast("double") /
          (sum(col("n")) * lit(1000000L)).cast("double")).as("avg_value"),
        max(col("mts")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  private val q99Sql =
    """SELECT user_id, count(*) AS n_events,
      | CAST(sum(v_us) AS DOUBLE) / 1e6 AS total_value,
      | CAST(sum(v_us) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE)
      |   AS avg_value,
      | CAST(max(ts) AS TIMESTAMP) AS last_ts
      |FROM (SELECT user_id, ts,
      |        CAST(round(value * 1e6, 0) AS BIGINT) AS v_us FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Statistical aggregate battery per group (SURVEY §2.4). var_samp is
    * scaled by 1e6 before rounding: its magnitude (~2e10) exceeds what
    * 4-dp rounding can stabilize across engines' summation orders. */
  private def q16(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        round(stddev_samp(col("o_totalprice")), 4).as("stddev_price"),
        round(var_samp(col("o_totalprice")) / 1e6, 4).as("var_price_m"),
        countDistinct(col("o_custkey")).as("n_cust"),
        round(median(col("o_totalprice")), 2).as("median_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  private val q16Sql =
    """SELECT o_orderstatus,
      | round(avg(o_totalprice), 4) AS avg_price,
      | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      | round(stddev_samp(o_totalprice), 4) AS stddev_price,
      | round(var_samp(o_totalprice) / 1e6, 4) AS var_price_m,
      | count(DISTINCT o_custkey) AS n_cust,
      | round(median(o_totalprice), 2) AS median_price,
      | count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** ROLLUP grouping sets with coalesced labels (SURVEY §2.4). */
  private def q17(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  private val q17Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      | coalesce(o_orderpriority, 'ALL') AS priority,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** CUBE over derived year x status (SURVEY §2.4). */
  private def q18(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .cube(col("yr"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("yr"), lit(-1)).as("yr"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"))
      .orderBy(col("yr"), col("status"))

  private val q18Sql =
    """SELECT coalesce(yr, -1) AS yr, coalesce(o_orderstatus, 'ALL') AS status,
      | count(*) AS n
      |FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus
      |      FROM orders)
      |GROUP BY CUBE(yr, o_orderstatus) ORDER BY yr, status""".stripMargin

  /** Scalar string-function battery (SURVEY §2.7 F1-F4). */
  private def q19(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_name"), 1, 8).as("prefix8"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"))
      .orderBy(col("p_partkey"))

  private val q19Sql =
    """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
      | substr(p_name, 1, 8) AS prefix8,
      | CAST(length(p_name) AS INT) AS name_len,
      | replace(p_name, ' ', '_') AS snake,
      | regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      | concat_ws('|', p_brand, p_type) AS brand_type,
      | lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date/time extraction + grouped aggregation (SURVEY §2.7 F8). */
  private def q20(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        quarter(col("o_orderdate")).as("qtr"),
        col("o_totalprice"))
      .groupBy(col("yr"), col("mo"), col("qtr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("yr"), col("mo"))

  private val q20Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      | CAST(month(o_orderdate) AS INT) AS mo,
      | CAST(quarter(o_orderdate) AS INT) AS qtr,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin

  /** nullif/coalesce null-handling semantics (SURVEY §2.7 F7). */
  private def q21(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))
        .as("disc_or_neg"))
      .groupBy(col("disc_or_neg"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("disc_or_neg"))

  private val q21Sql =
    """SELECT coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg,
      | count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY disc_or_neg""".stripMargin

  /** Scalar subquery as a broadcast 1-row cross join (SURVEY §2.3). */
  private def q23(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val thr = o.agg((avg(col("o_totalprice")) * 1.5).as("thr"))
    o.crossJoin(broadcast(thr))
      .filter(col("o_totalprice") > col("thr"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val q23Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Sessionization: 30-minute-gap session starts per user via lag +
    * integer microsecond arithmetic (SURVEY §2.5/§2.8 analog). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  private val q24Sql =
    """WITH g AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_us
      |  FROM events)
      |SELECT user_id,
      | CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      | count(*) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Tumbling-hour time buckets over the event stream (SURVEY §2.8 batch
    * analog of a windowed streaming agg). */
  private def q25(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("total_value"),
        round(avg(col("value")), 6).as("avg_value"))
      .orderBy(col("hr"))

  private val q25Sql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
      | count(*) AS n, round(sum(value), 4) AS total_value,
      | round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1 ORDER BY hr""".stripMargin

  /** JSON field extraction + aggregation (SURVEY §2.7 F9 inverse). */
  private def q26(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  private val q26Sql =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
      | round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Pivot order status into columns per year (SURVEY §2.4 extension). */
  private def q27(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("yr"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("yr"))

  private val q27Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
      | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  /** Unpivot wide numeric columns to (metric, value) rows. */
  private def q28(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        expr("stack(2, 'retailprice', p_retailprice, " +
          "'size', CAST(p_size AS DOUBLE)) AS (metric, value)"))
      .orderBy(col("p_partkey"), col("metric"))

  private val q28Sql =
    """SELECT p_partkey, metric, value FROM (
      |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
      |ORDER BY p_partkey, metric""".stripMargin

  /** Salted two-phase aggregation: hot-key-safe, result-identical to a
    * plain groupBy (the oracle IS the plain groupBy). */
  private def q42(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedSumCount(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")
      .select(col("l_returnflag"), round(col("total"), 2).as("total"),
        col("n"))
      .orderBy(col("l_returnflag"))

  private val q42Sql =
    """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS total,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** As-of join (operator Spark lacks; ops.AsOf composes it as ONE
    * key-shuffle + running last()): each click matched to the user's most
    * recent prior purchase. Oracle is DuckDB's native ASOF JOIN. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
    graft.ops.AsOf.asOfJoin(clicks, purchases, key = "user_id", ts = "ts",
        rightPayload = Seq("event_id", "ts"), tieBreak = Some("event_id"))
      .select(col("event_id"), col("user_id"),
        col("right_event_id").as("purch_event"),
        (unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  private val q43Sql =
    """SELECT c.event_id, c.user_id, p.event_id AS purch_event,
      | epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** Explicit GROUPING SETS beyond rollup/cube (SURVEY §2.4): two
    * single-dimension slices plus the grand total in one pass (Spark
    * expands grouping sets map-side; one shuffle on the padded keys). */
  private def q29(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  private val q29Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY status, priority""".stripMargin

  /** Exact interpolated percentiles per group (SURVEY §2.4 extension).
    * Interpolation weights are quarter/tenth fractions of 2-dp prices, so
    * true values carry <= 4 decimals — rounding at 4 dp is identity on
    * the exact value and absorbs both engines' last-bit float noise
    * (2-dp rounding would sit ON the .xx5 half-boundaries instead). */
  private def q45(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q45Sql =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** RANGE-frame window: per-user trailing 1-hour event count and value
    * sum, ordered by integer microseconds (RANGE frames need a numeric
    * order key; peers at the same ts share the frame in both engines). */
  private def q46(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value")).over(w), 4).as("sum_1h"))
      .orderBy(col("event_id"))
  }

  private val q46Sql =
    """SELECT event_id, user_id,
      | count(*) OVER w AS n_1h,
      | round(sum(value) OVER w, 4) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Bivariate statistics per group: correlation and sample covariance
    * (covariance scaled down before rounding — its magnitude exceeds what
    * 4-dp rounding can stabilize across engines' summation orders). */
  private def q51(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
        round(covar_samp(col("l_extendedprice"), col("l_quantity")) / 1e3, 4)
          .as("covar_k"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q51Sql =
    """SELECT l_returnflag,
      | round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
      | round(covar_samp(l_extendedprice, l_quantity) / 1e3, 4) AS covar_k,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Ordered string aggregation: nations per region as one sorted
    * comma-joined string (collect_set -> array_sort -> array_join keeps
    * the result deterministic; bare collect_list order is not). */
  private def q52(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
        countDistinct(col("n_name")).as("n_nations"))
      .orderBy(col("r_name"))

  private val q52Sql =
    """SELECT r_name,
      | string_agg(n_name, ',' ORDER BY n_name) AS nations,
      | count(DISTINCT n_name) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Custom typed Aggregator (SURVEY §2.9): geometric mean of order
    * totals per priority via graft.functions.Udafs.GeometricMean —
    * a two-phase (partial + merge) UDAF, not a collect-and-fold. */
  private def q59(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(graft.functions.Udafs.geoMean(col("o_totalprice")), 4)
          .as("geo_mean"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  private val q59Sql =
    """SELECT o_orderpriority,
      | round(exp(avg(ln(o_totalprice))), 4) AS geo_mean,
      | count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Hopping (sliding) window aggregation — `window(ts, 1h, 30m)`: each
    * event lands in exactly windowLen/hop = 2 overlapping windows. The
    * same expression incrementalizes under Structured Streaming; the
    * oracle materializes the 2 covering slots per event with unnest. */
  private def q62(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("total_value"))
      .orderBy(col("win_start"), col("event_type"))

  private val q62Sql =
    """WITH slots AS (
      |  SELECT unnest([
      |      CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP),
      |      CAST(time_bucket(INTERVAL 30 MINUTE, ts) AS TIMESTAMP)
      |        - INTERVAL 30 MINUTE
      |    ]) AS win_start,
      |    event_type, value
      |  FROM events)
      |SELECT win_start, event_type, count(*) AS n,
      |  round(sum(value), 4) AS total_value
      |FROM slots GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Native session-window aggregation — `session_window(ts, 30m)` per
    * user (the declarative twin of q24's mapGroupsWithState). Sessions
    * merge while the next event is STRICTLY inside last+gap, so the
    * oracle's gap-island break condition is `diff >= gap`; session end
    * is last event + gap. */
  private def q63(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val q63Sql =
    """WITH x AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id,
      |  CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
      |  count(*) AS n, round(sum(value), 4) AS total_value
      |FROM y GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Argmax per group via max_by — top-1-per-group as ONE partial-
    * aggregating shuffle of (group, argmax-pair) pairs, where the q11
    * window formulation must shuffle and sort every row. Ties broken by
    * orderkey inside the comparator (struct max) so the result is
    * deterministic in both engines. */
  private def q64(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
        max(col("o_totalprice")).as("best_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  private val q64Sql =
    """SELECT o_custkey,
      |  CAST(struct_extract(max(ROW(o_totalprice, o_orderkey)), 2) AS BIGINT)
      |    AS best_order,
      |  max(o_totalprice) AS best_price,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Top-3 per group via the bounded [[graft.functions.Udafs.TopK]]
    * Aggregator: each partition contributes at most k candidates to the
    * shuffle (map-side pruning in the partial phase), where q11's window
    * formulation shuffles and sorts every row. The oracle is the window
    * formulation — same rows, different physical strategy. */
  private def q65(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(graft.functions.Udafs.topK(3, col("c_acctbal"), col("c_custkey"))
        .as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")))
      .select(col("c_mktsegment"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("c_custkey"), col("col.score").as("c_acctbal"))
      .orderBy(col("c_mktsegment"), col("rank"))

  private val q65Sql =
    """SELECT c_mktsegment, rank, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey DESC) AS INT) AS rank
      |  FROM customer)
      |WHERE rank <= 3 ORDER BY c_mktsegment, rank""".stripMargin

  /** The remaining rank-family window functions in one pass: ntile,
    * percent_rank, cume_dist, first_value and nth_value share ONE
    * window ordering (unique tiebreak on o_orderkey), so all five
    * compute on a single key shuffle + sort — the plan a 100 TB
    * leaderboard query needs. Ratios are rounded in both engines. */
  private def q83(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first_value(col("o_orderkey")).over(w).as("top_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .filter(col("rn") <= 50)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  private val q83Sql =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    row_number() OVER w AS rn,
      |    ntile(4) OVER w AS quartile,
      |    round(percent_rank() OVER w, 6) AS pct_rank,
      |    round(cume_dist() OVER w, 6) AS cume,
      |    first_value(o_orderkey) OVER w AS top_order,
      |    nth_value(o_orderkey, 2) OVER w AS second_order
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rn <= 50 ORDER BY o_orderpriority, rn""".stripMargin

  /** Time-series gap fill: a dense (user, day) grid left-joins the
    * daily aggregate, and missing days forward-fill the last observed
    * value (last IGNORE NULLS over a running frame). The grid is a
    * broadcast crossJoin of distinct users x one generated day sequence
    * (two tiny sides — never a fact-table cartesian); daily sums are
    * exact integer micros so the fill propagates identical values in
    * both engines. The standard resample/ffill primitive for
    * training-curve and sensor pipelines. */
  private def q85(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      to_date(col("ts")).as("day"), col("value"))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(sum(round(col("value") * 1000000, 0).cast("long")).as("dv"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(
        span.select(explode(sequence(col("d0"), col("d1"))).as("day"))))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        col("dv").isNotNull.cast("int").as("has_event"),
        round(coalesce(last(col("dv"), ignoreNulls = true).over(w),
          lit(0L)) / 1000000.0, 6).as("value_ffill"))
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        col("has_event"), col("value_ffill"))
      .orderBy(col("user_id"), col("day"))
  }

  private val q85Sql =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
      |  FROM events),
      |daily AS (SELECT user_id, day,
      |    CAST(sum(CAST(round(value*1000000) AS BIGINT)) AS BIGINT) AS dv
      |  FROM ev GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |grid AS (SELECT u.user_id, CAST(g.day AS DATE) AS day
      |  FROM (SELECT DISTINCT user_id FROM ev) u, span,
      |    unnest(generate_series(span.d0, span.d1, INTERVAL 1 DAY))
      |      AS g(day))
      |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
      |  CASE WHEN dv IS NOT NULL THEN 1 ELSE 0 END AS has_event,
      |  round(coalesce(last_value(dv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING),
      |    0) / 1000000.0, 6) AS value_ffill
      |FROM grid LEFT JOIN daily USING (user_id, day)
      |ORDER BY user_id, day""".stripMargin
}

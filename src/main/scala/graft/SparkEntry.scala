package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; SQL-expressible ones also carry the DuckDB oracle SQL used by the
  * driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** Registry of all verifiable queries, grouped by module. */
  def registry: Seq[Q] =
    suites.Relational.all ++ suites.Analytic.all ++ suites.Tpch.all ++
      suites.TextSuite.all ++ suites.VectorSuite.all ++
      suites.GraphSuite.all ++ suites.WriSuite.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    suites.Relational.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables at `sfDir`. Static SQL for most queries;
    * the IVF/PQ oracles are GENERATED from a deterministic-trainer
    * replay on the data at this SF (Q.oracleGen), so they hold at any
    * scale factor. Omitted for non-SQL-expressible ops. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    registry.flatMap { q =>
      q.oracleGen.map(g => q.name -> g(spark, sfDir))
        .orElse(q.oracle.map(q.name -> _))
    }.toMap

  /** Driver-contract form: resolves the session and SF dir from the
    * environment (SPARK_GRAFT_SF_DIR, default = the t2 correctness SF). */
  def oracleSql: Map[String, String] =
    oracleSqlFor(SparkSession.active,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
}

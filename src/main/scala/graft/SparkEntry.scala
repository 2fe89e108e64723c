package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, EventQueries, GraphQueries, LinkageQueries, MediaQueries, NlpQueries, RelationalQueries, SenzingQueries, StreamingQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory names (SURVEY.md §2) to DataFrame
  * builders over a scale-factor directory; `oracleSql` holds the DuckDB twin
  * for each SQL-expressible query (same column names, same ORDER BY — the
  * driver hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the suspicious-network alias report (SURVEY.md §7 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    queries("q17_suspicious_aliases")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ EventQueries.queries ++ NlpQueries.queries ++
      MediaQueries.queries ++ SenzingQueries.queries ++
      StreamingQueries.queries ++ LinkageQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ EventQueries.oracles ++ NlpQueries.oracles ++
      MediaQueries.oracles ++ SenzingQueries.oracles ++
      StreamingQueries.oracles ++ LinkageQueries.oracles ++
      CurationQueries.oracles
}

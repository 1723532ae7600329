package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 * Query implementations live in graft.queries.*; each entry here has a
 * DuckDB-oracle SQL twin with identical column names and values. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the canonical SparkER
   * pipeline (token blocking -> purging -> filtering -> CBS WNP) on the
   * part table as a dirty profile source. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    ErQueries.all("er_wnp_cbs_avg_or_dirty")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ErQueries.all ++ TrainQueries.all ++ SupQueries.all ++ SqlQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (ErOracles.all ++ TrainOracles.all ++ SupOracles.all ++ SqlOracles.all)
}

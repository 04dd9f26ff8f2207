package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionQueries, OracleQueries, ReferenceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every declared operator/query name to a Spark
  * implementation; `oracleSql` carries the equivalent ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names and
  * value canonicalization are aligned between the two (see
  * [[graft.queries.OracleQueries]] scaladoc for the float-parity rules).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    OracleQueries.q03(spark, "/root/testdata/sf0.001")

  private def registry =
    OracleQueries.all ++ ExtensionQueries.all ++ ReferenceQueries.all

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, (fn, _)) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.map { case (name, (_, sql)) => name -> sql }.toMap
}

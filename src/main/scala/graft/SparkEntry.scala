package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtensionQueries, ParityQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the t2 surface: one entry per implemented operator from
  * SURVEY.md §2 (p/g/a/j = reference parity over the [[graft.queries.VisitsView]]
  * events synthesis; q/w/j/set/x = general relational surface; e/t/d/m =
  * charter extension operators). Every oracle-expressible query has a
  * matching DuckDB SQL in `oracleSql`; the remainder (xxhash64/HLL/LSH-based)
  * get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: the full visits ETL (validate → split → prepare → aggregate →
    * merge) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("j1_visitantes_merge")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++ ExtensionQueries.queries

  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ RelationalQueries.oracleSql ++ ExtensionQueries.oracleSql
}

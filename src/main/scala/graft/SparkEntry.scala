package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CorpusQueries, ExtQueries, FileQueries, ParityQueries, PipelineQueries, TpchQueries}
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` is the full operator inventory (each with a DuckDB oracle
  * in `oracleSql` where SQL-expressible); `entry` is the flagship
  * smoke query. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * duplicate-group detection — the reference's raison d'être. */
  def entry(spark: SparkSession): DataFrame =
    FileQueries.duplicateGroups(
      Tables.files(spark, "/root/testdata/sf0.001"),
      minGroupSize = 2, limit = 100, offset = 0)

  /** One entry per implemented operator: SURVEY.md §2 inventory (fi_*)
    * plus the training-data-pipeline surface (ta_/dd_/ss_/mm_*). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ PipelineQueries.queries ++ CorpusQueries.queries ++
      ExtQueries.queries ++ TpchQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ PipelineQueries.oracle ++ CorpusQueries.oracle ++
      ExtQueries.oracle ++ TpchQueries.oracle
}

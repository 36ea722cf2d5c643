package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module operator registries. Every operator is a
  * pure `(SparkSession, sfDir) => DataFrame`; oracle-checked ones carry
  * equivalent DuckDB SQL (column names matched exactly for the driver's
  * hash compare).
  */
object SparkEntry {
  private def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      functions.ScalarQueries.defs ++
      operators.EventTime.defs ++
      operators.ScalePatterns.defs ++
      operators.Statistics.defs ++
      operators.TpchExtra.defs ++
      operators.Graph.defs ++
      operators.TextOps.defs ++
      operators.Dedup.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs ++
      operators.Curation.defs ++
      etl.SpecQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}

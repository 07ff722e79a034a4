package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are declared in `graft.queries.*` as (DataFrame program, DuckDB
  * oracle SQL) pairs; this object is just the aggregation point.
  */
object SparkEntry {

  /** Every declared query, across all families. */
  def all: Seq[Q] =
    Relational.defs ++ Scalar.defs ++ Advanced.defs ++ Coverage.defs ++
      Extensions.defs ++ MultimodalQueries.defs ++ ScaleOps.defs ++
      Surface.defs ++ Curation.defs ++ Pipeline.defs ++ Round10.defs ++
      Round11.defs ++ Round12.defs ++ Round13.defs ++ Round14.defs ++
      Round14b.defs ++ Round15.defs ++ Round16.defs ++ Round17.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}

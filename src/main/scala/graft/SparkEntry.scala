package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is a named [[QueryDef]] in one of the
  * modules below; `queries` and `oracleSql` are derived views over the same
  * definitions so the Spark implementation and the DuckDB oracle can never
  * go out of sync on names.
  */
object SparkEntry {

  /** The full engine surface, grouped by SURVEY.md §2 sections. */
  def defs: Seq[QueryDef] =
    Aggregates.all ++ Joins.all ++ Windows.all ++ SetOps.all ++
      Scalars.all ++ EventsQueries.all ++ FormatQueries.all ++
      TextAnalysis.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}

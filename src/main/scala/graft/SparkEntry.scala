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

  /** The scale-factor directory the driver's correctness gate verifies at;
    * [[oracleSql]] is built against it by default. Oracle statements that
    * embed run-scoped materialization paths (q63's two-stage sketch check)
    * derive them from this — `Verify` passes its actual sfDir through
    * [[oracleSqlFor]] so the dumped SQL always matches the run. */
  val DefaultVerifySf = "/root/testdata/sf0.01"

  /** The full engine surface, grouped by SURVEY.md §2 sections. */
  def defsFor(sfDir: String): Seq[QueryDef] =
    Aggregates.all ++ Joins.all ++ LayoutQueries.all(sfDir) ++ Windows.all ++
      SetOps.all ++ Scalars.all ++ EventsQueries.all ++ FormatQueries.all ++
      TextAnalysis.all ++ DedupQueries.all(sfDir) ++ SimilarityQueries.all(sfDir) ++
      MultimodalQueries.all ++ GraphQueries.all ++ StreamingQueries.all(sfDir)

  def defs: Seq[QueryDef] = defsFor(DefaultVerifySf)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlFor(DefaultVerifySf)

  /** Oracle SQL with run-scoped materialization paths derived from the
    * given sfDir (used by `Verify` so a sf0.1 bench and a sf0.01 verify
    * can never read each other's staged files). */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    defsFor(sfDir).flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}

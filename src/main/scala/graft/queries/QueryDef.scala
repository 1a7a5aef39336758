package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark-first implementation plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle statement
  * over the same Parquet tables. The driver's correctness gate
  * (`graft.Verify`) hash-compares the two at sf0.01.
  *
  * Determinism rules every QueryDef follows so the hash compare is stable:
  *   - results end with a total ORDER BY (same in Spark and oracle SQL);
  *   - floating aggregates go through `CAST(SUM(CAST(x AS DECIMAL)) AS
  *     DOUBLE)` so the sum is order-independent and bit-identical across
  *     engines (per-row double arithmetic is IEEE-deterministic; only
  *     reduction order varies, and decimals kill that variance);
  *   - every computed column is aliased identically on both sides (the
  *     driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object QueryDef {
  /** DuckDB/Spark-shared SQL idiom: order-independent sum of a double
    * expression at decimal scale 8, rounded to 2 decimals as double. */
  def dsumSql(expr: String, alias: String): String =
    s"ROUND(CAST(SUM(CAST($expr AS DECIMAL(30,8))) AS DOUBLE), 2) AS $alias"
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar/derived-column surface (SURVEY.md §2.3 P5) plus subqueries.
  * All expressions are `org.apache.spark.sql.functions._` builtins —
  * codegen'd, no UDFs in the hot path. Per-row double math is IEEE
  * deterministic, so these compare exactly against the oracle.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q30_scalar_string",
      Some("""SELECT p_partkey,
        UPPER(p_brand) AS up_brand,
        LOWER(p_type) AS low_type,
        CAST(LENGTH(p_name) AS INT) AS name_len,
        SUBSTRING(p_type, 1, 5) AS type5,
        REPLACE(p_name, ' ', '_') AS name_us,
        CONCAT(p_brand, ':', p_type) AS brand_type,
        LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size3,
        TRIM(p_name) AS name_trim
        FROM part ORDER BY p_partkey"""),
      (s, dir) =>
        t(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_brand")).as("up_brand"),
          lower(col("p_type")).as("low_type"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type5"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          lpad(col("p_size").cast("string"), 3, "0").as("size3"),
          trim(col("p_name")).as("name_trim"))
          .orderBy(col("p_partkey"))),

    QueryDef(
      "q31_scalar_date",
      Some("""SELECT o_orderkey,
        CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
        FROM orders ORDER BY o_orderkey"""),
      (s, dir) =>
        t(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          // DATE, not timestamp: both engines emit date32 (a timestamp
          // here ships parquet ns-vs-us unit skew across engines)
          trunc(col("o_orderdate"), "month").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
          last_day(col("o_orderdate")).as("month_end"))
          .orderBy(col("o_orderkey"))),

    QueryDef(
      "q32_scalar_math",
      Some("""SELECT l_orderkey, l_linenumber,
        ROUND(ABS(l_discount - 0.05), 4) + 0 AS abs_disc,
        CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_price,
        CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
        ROUND(SQRT(l_extendedprice), 4) + 0 AS sqrt_price,
        l_orderkey % 7 AS key_mod,
        ROUND(l_quantity * l_quantity, 2) + 0 AS qty_sq
        FROM lineitem WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber"""),
      (s, dir) =>
        t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000).select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 4).as("abs_disc"),
          ceil(col("l_extendedprice")).cast("long").as("ceil_price"),
          floor(col("l_extendedprice")).cast("long").as("floor_price"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          (col("l_orderkey") % 7).as("key_mod"),
          round(col("l_quantity") * col("l_quantity"), 2).as("qty_sq"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))),

    QueryDef(
      "q33_case_expr",
      Some("""SELECT
        CASE WHEN o_totalprice < 50000 THEN 'small'
             WHEN o_totalprice < 200000 THEN 'medium'
             WHEN o_totalprice < 350000 THEN 'large'
             ELSE 'jumbo' END AS bucket,
        COUNT(*) AS n,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE), 2) + 0 AS total
        FROM orders GROUP BY 1 ORDER BY bucket"""),
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 200000, "medium")
              .when(col("o_totalprice") < 350000, "large")
              .otherwise("jumbo").as("bucket"))
          .agg(count(lit(1)).as("n"),
            Aggregates.dsum(col("o_totalprice")).as("total"))
          .orderBy(col("bucket"))),

    // Scalar subquery: threshold computed once (exact decimal avg), then a
    // pushed-down filter — at scale this is a two-job plan, not a per-row
    // subquery probe.
    QueryDef(
      "q35_scalar_subquery",
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) FROM orders)
        GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
          WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) FROM orders)
          GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      }),

    QueryDef(
      "q36_correlated_exists",
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
          WHERE EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }),

    QueryDef(
      "q37_in_subquery",
      Some("""SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 420000)
        ORDER BY c_custkey"""),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey, c_mktsegment FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 420000)
          ORDER BY c_custkey""")
      })
  )
}

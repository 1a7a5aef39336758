package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Set-operation surface (SURVEY.md §2.8, Tier B/C).
  * union/intersect/except are Spark built-ins; the ALL variants keep
  * multiset semantics (hash-partitioned by the full row, so they scale the
  * same as a distinct aggregation).
  */
object SetOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q26_union_all",
      Some("""SELECT * FROM (
        SELECT c_custkey AS id, 'customer' AS kind, ROUND(c_acctbal, 2) + 0 AS acctbal FROM customer
        UNION ALL
        SELECT s_suppkey AS id, 'supplier' AS kind, ROUND(s_acctbal, 2) + 0 AS acctbal FROM supplier
      ) ORDER BY kind, id"""),
      (s, dir) => {
        val c = t(s, dir, "customer").select(
          col("c_custkey").as("id"), lit("customer").as("kind"),
          round(col("c_acctbal"), 2).as("acctbal"))
        val sp = t(s, dir, "supplier").select(
          col("s_suppkey").as("id"), lit("supplier").as("kind"),
          round(col("s_acctbal"), 2).as("acctbal"))
        c.unionByName(sp).orderBy(col("kind"), col("id"))
      }),

    QueryDef(
      "q27_intersect",
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey"""),
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey"))),

    QueryDef(
      "q28_except",
      Some("""SELECT p_size FROM part
        EXCEPT
        SELECT p_size FROM part WHERE p_retailprice > 1200
        ORDER BY p_size"""),
      (s, dir) =>
        t(s, dir, "part").select(col("p_size"))
          .except(t(s, dir, "part").filter(col("p_retailprice") > 1200).select(col("p_size")))
          .orderBy(col("p_size"))),

    QueryDef(
      "q29_intersect_all",
      Some("""SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A' AND l_orderkey <= 1000
        INTERSECT ALL
        SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey <= 1000
        ORDER BY l_quantity"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
        li.filter(col("l_returnflag") === "A").select(col("l_quantity"))
          .intersectAll(li.filter(col("l_returnflag") === "R").select(col("l_quantity")))
          .orderBy(col("l_quantity"))
      })
  )
}

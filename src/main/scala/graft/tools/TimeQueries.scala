package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Time a comma-separated list of query-name prefixes at a given sfDir —
  * the per-query slice of Bench for local iteration. Optional third arg:
  * number of passes (default 2; pass 1 absorbs init, later passes are the
  * warmed steady-state — useful for spotting run-to-run variance). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TimeQueries <prefix>[,<prefix>...] [sfDir] [passes]")
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val prefixes = args(0).split(",").toSeq
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    // pass 1 absorbs init; later passes are the warmed measurement
    (1 to passes).foreach { pass =>
      qs.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[time] pass$pass $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}

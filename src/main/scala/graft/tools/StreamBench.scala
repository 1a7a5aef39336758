package graft.tools

import graft.GraftSession

/** Diagnostic: time just the streaming drains (q8x) at the configured core
  * count, to iterate on drain overhead without the full bench. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.range(1000000).selectExpr("sum(id)").collect()
    var total = 0.0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("q8")).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        total += dt
        println(f"[sbench] $name rows=$n ${dt}%.2f s")
      }
    println(f"[sbench] total ${total}%.2f s")
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time one named query and print its formatted physical plan.
  * Usage: runMain graft.tools.Explain <queryName> <sfDir> [explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    val t1 = System.nanoTime()
    // second run: steady-state (code cached, JIT warm)
    val n2 = SparkEntry.queries(name)(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"[explain] $name rows=$n cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs rows2=$n2")
    spark.stop()
  }
}

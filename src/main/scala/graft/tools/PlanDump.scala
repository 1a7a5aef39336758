package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump `.explain("formatted")` for a comma-separated list of query-name
  * prefixes to files under an output dir — the round-16 optimization
  * evidence (`plans/r16/<query>_{before,after}.txt`). Builds the frame
  * (which runs a query's EAGER setup: persisted indexes, stream drains)
  * but does not execute the final action.
  *
  *   sbt "runMain graft.tools.PlanDump qal,qap plans/r16 _after"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val prefixes = args(0).split(",").toSeq
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val suffix = if (args.length > 2) args(2) else "_after"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
          System.err.println(s"[plandump] wrote $name$suffix")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

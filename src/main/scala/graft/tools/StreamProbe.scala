package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.GraftSession

/** Diagnostic: run the streaming drains one at a time and print the
  * micro-batch count and per-phase durations from StreamingQueryProgress,
  * to locate where the drain wall-clock goes.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} stateOps=${p.stateOperators.map(o =>
            s"(rows=${o.numRowsTotal} mem=${o.memoryUsedBytes} commit=${o.commitTimeMs})").mkString(",")}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val targets = Seq("q85_stream_stream_join", "q82_stream_sessionize")
    targets.foreach { name =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(s"[probe] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}

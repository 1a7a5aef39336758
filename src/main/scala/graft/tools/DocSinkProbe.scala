package graft.tools

import graft.GraftSession

/** Diagnostic: phase timing for q87 (stream → graft-doc sink → snapshot). */
object DocSinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(8)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dprobe] $tag ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val tmp = java.nio.file.Files.createTempDirectory("dprobe").toFile.getAbsolutePath
    import org.apache.spark.sql.functions._
    val schema = s.read.parquet(s"$sfDir/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEvents(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)).drop("ts_ns")
    time("writeStream") {
      graft.connector.GraftDoc.writeStream(stream, "event_id", s"$tmp/out", s"$tmp/ckpt")
        .awaitTermination()
    }
    time("log count") { println(graft.connector.GraftDoc.log(s, s"$tmp/out").count()) }
    time("snapshot agg") {
      println(graft.connector.GraftDoc.snapshot(s, s"$tmp/out")
        .groupBy(col("event_type")).agg(count(lit(1))).collect().length)
    }
    // batch write comparison
    val batch = s.read.parquet(s"$sfDir/events.parquet")
    time("batch graft-doc write") {
      graft.connector.GraftDoc.write(batch, "event_id", s"$tmp/out2", overwrite = true)
    }
    s.stop()
  }
}

package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Driver-overhead decomposition for the low-occupancy queries
  * (BimodalProbe's occ=0.03-0.14 family): runs ONE named query in a
  * warmed JVM and prints, per attempt, the number of Spark JOBS and
  * STAGES it ran, the wall covered by at least one running job vs the
  * wall covered by none (= pure driver think time: Catalyst planning,
  * codegen, commit/checkpoint I/O, foreachBatch orchestration), and the
  * top job-gap spans. This splits "low occupancy" into (a) gaps BETWEEN
  * jobs (driver work between actions) and (b) idle cores DURING jobs
  * (micro-stages / skew), which point at different fixes.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobProfile qc8 2"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val prefix = if (args.nonEmpty) args(0) else "qc8"
    val n = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    case class Span(start: Long, var end: Long)
    val jobs = mutable.Map[Int, Span]()
    val done = mutable.ArrayBuffer[Span]()
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = Span(e.time, -1) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.remove(e.jobId).foreach { s => s.end = e.time; done += s }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); ()
      }
    })

    val (name, fn) = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .find(_._1.startsWith(prefix))
      .getOrElse(sys.error(s"no query starts with '$prefix'"))
    println(s"[jobprofile] $name x$n at $sfDir cpus=$cpus")
    fn(spark, sfDir).collect() // warmup
    for (i <- 1 to n) {
      done.synchronized(done.clear())
      val w0 = System.currentTimeMillis()
      fn(spark, sfDir).count()
      val w1 = System.currentTimeMillis()
      Thread.sleep(400) // listener drain
      val spans = done.synchronized(done.toVector)
        .filter(s => s.end >= w0 && s.start <= w1)
        .sortBy(_.start)
      // merge job spans; collect gaps with no job running
      var covered = 0L
      var gaps = mutable.ArrayBuffer[(Long, Long)]()
      var cur = w0
      for (s <- spans) {
        if (s.start > cur) gaps += ((cur, s.start))
        covered += math.min(s.end, w1) - math.max(s.start, cur).min(s.end)
        cur = math.max(cur, s.end)
      }
      if (cur < w1) gaps += ((cur, w1))
      val gapTotal = gaps.map(g => g._2 - g._1).sum
      val wall = w1 - w0
      println(f"[jobprofile] attempt=$i wall=${wall / 1e3}%.2fs jobs=${spans.size} " +
        f"stages=${stages.get} tasks=${tasks.get} " +
        f"job_covered=${(wall - gapTotal) / 1e3}%.2fs between_jobs=${gapTotal / 1e3}%.2fs " +
        f"top_gaps=${gaps.sortBy(g => g._1 - g._2).take(5).map(g => f"${(g._2 - g._1) / 1e3}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

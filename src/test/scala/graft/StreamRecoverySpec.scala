package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger

/** Exactly-once across restarts (SURVEY.md §2.10 delivery semantics): the
  * reference is at-least-once with restart amnesia (randomized consumer
  * group, §1.4 quirk 5); the engine's contract is checkpointed offsets —
  * stop/restart must neither drop nor duplicate rows.
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("file stream + checkpoint: restart resumes without loss or duplication") {
    val base = Files.createTempDirectory("graft_recovery").toFile.getAbsolutePath
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    Files.createDirectories(java.nio.file.Paths.get(src))

    def addBatch(ids: Range): Unit =
      ids.toDF("id").write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id long")
        .parquet(src)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    addBatch(1 to 10)
    runOnce()
    // restart with NO new data: checkpoint must prevent re-emission
    runOnce()
    addBatch(11 to 20)
    runOnce()

    val got = spark.read.parquet(out).as[Long].collect().sorted.toSeq
    assert(got == (1L to 20L), s"expected exactly 1..20 once each, got $got")
  }
}

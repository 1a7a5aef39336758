package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Exercises the scale-state configuration that a 100 TB deployment runs
  * with (VERDICT r01 "missing #5" — these existed only as comments):
  * RocksDB state store provider (state larger than executor memory) over
  * a durable checkpoint, surviving a restart with state intact. The
  * provider class is recorded per-query at first start, so it is set
  * around query start and restored after.
  */
class ScaleStateSpec extends SparkSpec {
  import spark.implicits._

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withConf[T](key: String, value: String)(f: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful aggregation on RocksDB state store survives restart") {
    val base = Files.createTempDirectory("graft_rocksdb").toFile.getAbsolutePath
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")

    def runOnce(sinkName: String): Unit = withConf(
      "spark.sql.streaming.stateStore.providerClass", RocksDb) {
      val q = spark.readStream.schema("user long, v long").parquet(src)
        .groupBy(col("user")).agg(sum(col("v")).as("total"))
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((1L, 10L), (2L, 20L)).toDF("user", "v").write.mode("append").parquet(src)
    runOnce("rocks_a")
    assert(spark.table("rocks_a").orderBy("user")
      .as[(Long, Long)].collect().toSeq == Seq(1L -> 10L, 2L -> 20L))

    // restart from the same checkpoint: prior state must be recovered
    // from RocksDB files, new rows must MERGE into it (not replace it)
    Seq((1L, 5L), (3L, 7L)).toDF("user", "v").write.mode("append").parquet(src)
    runOnce("rocks_b")
    assert(spark.table("rocks_b").orderBy("user")
      .as[(Long, Long)].collect().toSeq ==
      Seq(1L -> 15L, 2L -> 20L, 3L -> 7L))

    // the checkpoint really carries RocksDB-format state artifacts
    val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt, "state"))
      .iterator().asScala.map(_.toString).toSeq
    assert(stateFiles.exists(f => f.endsWith(".zip") || f.contains(".sst") ||
      f.contains("rocksdb")), s"no RocksDB state artifacts under $ckpt/state")
  }

  private implicit class IterWrap[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}

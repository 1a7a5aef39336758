package graft

import java.nio.file.Files

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.connector.{GraftDoc, GraftDocLog, GraftDocWriteBuilder}

/** DSv2 keyed-document connector (`format("graft-doc")`): upsert-by-`_id`,
  * commit log, streaming epoch idempotence, column pruning, compaction.
  * Reference parity: `MapRDBJSONSink.java:96,102-146` (keyed put = upsert;
  * at-least-once source → exactly-once table contents). */
class GraftDocConnectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_doc_tbl").toString

  test("batch write + read roundtrip through format(graft-doc)") {
    val dir = tmp()
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    GraftDoc.write(df, "k", dir)
    val back = spark.read.format("graft-doc").load(dir)
    assert(back.columns.toSeq == Seq("_id", "name", "v", "_commit"))
    assert(back.count() == 2)
    assert(back.orderBy("_id").select("name").as[String].collect().toSeq == Seq("a", "b"))
  }

  test("re-written _ids dedupe: snapshot keeps the latest version") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, "old"), (2L, "keep")).toDF("k", "name"), "k", dir)
    GraftDoc.write(Seq((1L, "new"), (3L, "add")).toDF("k", "name"), "k", dir)
    // log holds every version; snapshot resolves the upsert
    assert(GraftDoc.log(spark, dir).count() == 4)
    val snap = GraftDoc.snapshot(spark, dir).orderBy("_id")
      .select("_id", "name").as[(String, String)].collect().toSeq
    assert(snap == Seq("1" -> "new", "2" -> "keep", "3" -> "add"))
  }

  test("overwrite truncates the log") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, "a")).toDF("k", "name"), "k", dir)
    GraftDoc.write(Seq((9L, "z")).toDF("k", "name"), "k", dir, overwrite = true)
    assert(GraftDoc.log(spark, dir).select("_id").as[String].collect().toSeq == Seq("9"))
  }

  test("write schema without leading _id string is rejected (W3 validation)") {
    val dir = tmp()
    val e = intercept[Exception] {
      Seq((1L, "a")).toDF("k", "name").write.format("graft-doc")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("_id"))
  }

  test("column pruning reaches the scan (only requested doc fields parsed)") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, "a", 10.0)).toDF("k", "name", "v"), "k", dir)
    val pruned = spark.read.format("graft-doc").load(dir).select("name")
    // physical read schema must be just `name` — no _id, v, or _commit
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(pruned.as[String].collect().toSeq == Seq("a"))
  }

  test("streaming epoch commit is idempotent per (queryId, epochId)") {
    val dir = tmp()
    val docSchema = StructType(Seq(
      StructField("_id", StringType), StructField("n", LongType)))
    def streamingWrite(qid: String) = {
      val info = new LogicalWriteInfo {
        override def options(): CaseInsensitiveStringMap =
          new CaseInsensitiveStringMap(java.util.Map.of("path", dir))
        override def queryId(): String = qid
        override def schema(): StructType = docSchema
      }
      new GraftDocWriteBuilder(info, dir).build().toStreaming
    }
    val pInfo = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }

    def writeEpoch(w: org.apache.spark.sql.connector.write.streaming.StreamingWrite,
        epoch: Long, id: String): Unit = {
      val task = w.createStreamingWriterFactory(pInfo).createWriter(0, 0L, epoch)
      task.write(InternalRow(UTF8String.fromString(id), 1L))
      val msg = task.commit()
      w.commit(epoch, Array(msg))
    }

    val w = streamingWrite("query-A")
    writeEpoch(w, 0L, "a")
    writeEpoch(w, 1L, "b")
    // replay of epoch 1 (at-least-once source): must be a no-op
    writeEpoch(w, 1L, "b")
    assert(GraftDoc.log(spark, dir).count() == 2)
    // a different query's epoch 1 is NOT deduped (idempotence is per query)
    writeEpoch(streamingWrite("query-B"), 1L, "c")
    assert(GraftDoc.log(spark, dir).count() == 3)
  }

  test("end-to-end writeStream format(graft-doc) with AvailableNow") {
    val dir = tmp()
    val src = tmp()
    val ckpt = tmp()
    Seq((1L, "x"), (2L, "y")).toDF("k", "name").write.parquet(s"$src/in")
    val stream = spark.readStream
      .schema(StructType(Seq(StructField("k", LongType), StructField("name", StringType))))
      .parquet(s"$src/in")
    GraftDoc.writeStream(stream, "k", dir, ckpt).awaitTermination()
    assert(GraftDoc.snapshot(spark, dir).count() == 2)
    // restart from the same checkpoint with no new data: no new commits
    val before = GraftDocLog.latestCommitSeq(dir)
    GraftDoc.writeStream(spark.readStream
      .schema(StructType(Seq(StructField("k", LongType), StructField("name", StringType))))
      .parquet(s"$src/in"), "k", dir, ckpt).awaitTermination()
    assert(GraftDocLog.latestCommitSeq(dir) == before)
  }

  test("compact folds history into one base commit; snapshot unchanged") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, "v1"), (2L, "b")).toDF("k", "name"), "k", dir)
    GraftDoc.write(Seq((1L, "v2")).toDF("k", "name"), "k", dir)
    GraftDoc.write(Seq((2L, "b2"), (3L, "c")).toDF("k", "name"), "k", dir)
    val want = GraftDoc.snapshot(spark, dir).orderBy("_id")
      .select("_id", "name").as[(String, String)].collect().toSeq
    GraftDoc.compact(spark, dir)
    val got = GraftDoc.snapshot(spark, dir).orderBy("_id")
      .select("_id", "name").as[(String, String)].collect().toSeq
    assert(got == want)
    // history folded: the log now holds exactly the live documents
    assert(GraftDoc.log(spark, dir).count() == 3)
  }

  test("append with a different schema is rejected; overwrite redefines") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, "a")).toDF("k", "name"), "k", dir)
    val e = intercept[Exception] {
      GraftDoc.write(Seq((2L, 5.0)).toDF("k", "score"), "k", dir)
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    // the failed append must not have committed anything
    assert(GraftDoc.log(spark, dir).count() == 1)
    // overwrite legitimately redefines the table schema
    GraftDoc.write(Seq((2L, 5.0)).toDF("k", "score"), "k", dir, overwrite = true)
    assert(GraftDoc.log(spark, dir).columns.toSeq ==
      Seq("_id", "score", "_commit"))
  }

  test("nulls omitted from stored documents (reference :131 null guard)") {
    val dir = tmp()
    GraftDoc.write(Seq((1L, Some("x")), (2L, None)).toDF("k", "name"), "k", dir)
    val files = GraftDocLog.listCommitFiles(dir).map(_._2)
    val lines = files.flatMap(f => scala.io.Source.fromFile(
      f.stripPrefix("file:")).getLines()).sorted
    assert(lines == Seq("""{"_id":"1","name":"x"}""", """{"_id":"2"}"""))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.DocumentSink

/** SURVEY.md §2.9 W1 sink semantics: key hoist (P3), key dropped from body,
  * null fields omitted from documents (P2). */
class DocumentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("toDocuments hoists key to string _id and drops it from the body") {
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("k", "name", "v")
    val docs = DocumentSink.toDocuments(df, "k")
    assert(docs.columns.toSeq == Seq("_id", "name", "v"))
    assert(docs.schema("_id").dataType.typeName == "string")
    assert(docs.orderBy("_id").collect().map(_.getString(0)).toSeq == Seq("1", "2"))
  }

  test("toDocuments can keep the key in the body (non-reference mode)") {
    val df = Seq((1L, "a")).toDF("k", "name")
    val docs = DocumentSink.toDocuments(df, "k", dropKeyFromBody = false)
    assert(docs.columns.toSeq == Seq("_id", "k", "name"))
  }

  test("missing key field rejected") {
    val df = Seq((1L, "a")).toDF("k", "name")
    assertThrows[IllegalArgumentException](DocumentSink.toDocuments(df, "nope"))
  }

  test("json write omits null fields (reference MapRDBJSONSink.java:131)") {
    val dir = Files.createTempDirectory("graft_sink_spec").toString
    val df = Seq((1L, Some("x"), Some(5)), (2L, None, None))
      .toDF("k", "name", "n")
    DocumentSink.write(df, "k", dir)
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines(0) == """{"_id":"1","name":"x","n":5}""")
    assert(lines(1) == """{"_id":"2"}""") // nulls omitted entirely
  }

  test("streaming variant writes batches through foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sink_stream").toString
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "a"), (2L, "b"))
    val q = DocumentSink.writeStream(
      ms.toDF().toDF("k", "name"), "k", s"$dir/out", s"$dir/ckpt")
    q.awaitTermination(60000)
    val docs = spark.read.json(s"$dir/out/batch_0")
    assert(docs.count() == 2)
    assert(docs.columns.sorted.toSeq == Seq("_id", "name"))
  }

  test("targetFileRows caps rows per output file (small-files control)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val out = java.nio.file.Files.createTempDirectory("sink_cap").toString
    graft.sinks.DocumentSink.write(df.coalesce(1), "id", out,
      format = "parquet", targetFileRows = Some(25L))
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4, s"expected >=4 files, got ${files.length}")
    assert(spark.read.parquet(out).count() == 100)
  }
}

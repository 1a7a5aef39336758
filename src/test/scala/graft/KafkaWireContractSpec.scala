package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.StreamSource

/** Wire-format contract tests for the Kafka path (SURVEY.md §2.1 S1).
  *
  * The sandbox has no spark-sql-kafka jar and no broker (zero egress), so
  * `readStream.format("kafka")` cannot execute — the first test pins that
  * fact so a future environment with the jar flips it visibly. The rest
  * drive the EXACT post-`load()` pipeline (`StreamSource.decodeWire`)
  * with frames declared in the Kafka source's documented output schema —
  * including a real incremental streaming execution over a MemoryStream —
  * so the only untested seam left is the connector's own `load()`.
  */
class KafkaWireContractSpec extends SparkSpec {
  import spark.implicits._

  private val cfgCsv = StreamSource.StreamConfig(
    referenceName = "wire", brokers = "b:9092", topics = Seq("t"),
    format = Some("csv"),
    avroSchemaJson = Some("""{"type":"record","name":"r","fields":[
      {"name":"user","type":"string"},{"name":"amount","type":"int"}]}"""))

  // (key, value, topic, partition, offset, timestamp, timestampType)
  private type Wire = (Array[Byte], Array[Byte], String, Int, Long, Timestamp, Int)
  private def rec(payload: String, off: Long): Wire =
    (null, payload.getBytes("UTF-8"), "t", 0, off, new Timestamp(1700000000000L + off), 0)

  test("sandbox ships no kafka connector (documents the untestable seam)") {
    val e = intercept[Exception] {
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "b:9092")
        .option("subscribe", "t").load()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"unexpected failure mode: ${e.getMessage}")
  }

  test("decodeWire rejects frames that are not Kafka-shaped") {
    val notWire = Seq(("x", 1)).toDF("value", "n")
    val e = intercept[IllegalArgumentException](
      StreamSource.decodeWire(notWire, cfgCsv))
    assert(e.getMessage.contains("not a Kafka wire frame"))
  }

  test("batch wire frame decodes through the declared format") {
    val df = Seq(rec("alice,3", 0L), rec("bob,5", 1L))
      .toDF(StreamSource.wireSchema.fieldNames: _*)
    val out = StreamSource.decodeWire(df, cfgCsv)
    assert(out.columns.toSeq ==
      Seq("key", "topic", "partition", "offset", "timestamp", "user", "amount"))
    assert(out.orderBy("offset").select("user", "amount")
      .as[(String, Int)].collect().toSeq == Seq("alice" -> 3, "bob" -> 5))
  }

  test("streaming wire frame: incremental decode → agg → memory sink") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Wire]
    val stream = mem.toDF().toDF(StreamSource.wireSchema.fieldNames: _*)
    val agg = StreamSource.decodeWire(stream, cfgCsv)
      .groupBy(col("user"))
      .agg(sum(col("amount")).as("total"))
    val q = agg.writeStream.format("memory").queryName("wire_contract")
      .outputMode("complete").trigger(Trigger.AvailableNow())

    mem.addData(rec("alice,3", 0L), rec("bob,5", 1L))
    q.start().awaitTermination()
    // second micro-batch over the same checkpointed query name
    mem.addData(rec("alice,4", 2L))
    q.start().awaitTermination()

    val out = spark.table("wire_contract").orderBy("user")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq("alice" -> 7L, "bob" -> 5L))
  }

  test("raw (null-schema) mode: payload lands in a single message column") {
    // reference MapRStreamConfig.java:83 — absent schema → one default
    // payload field (widget default `MapRStream-streamingsource.json:70-79`)
    val cfgRaw = StreamSource.StreamConfig(
      referenceName = "raw", brokers = "b:9092", topics = Seq("t"))
    val df = Seq(rec("payload-bytes", 0L))
      .toDF(StreamSource.wireSchema.fieldNames: _*)
    val out = StreamSource.decodeWire(df, cfgRaw)
    assert(out.columns.toSeq ==
      Seq("key", "topic", "partition", "offset", "timestamp", "message"))
    assert(out.schema("message").dataType.typeName == "binary")
    assert(new String(out.select("message").as[Array[Byte]].head(), "UTF-8")
      == "payload-bytes")
  }
}

package graft

import graft.sources.{Lineage, StreamSource}
import graft.sources.StreamSource.StreamConfig

/** Option-mapping + lineage specs for the streaming source connector
  * (SURVEY.md §2.1 S1-S5). The Kafka connector itself is Spark's; what the
  * engine owns — and what these tests pin — is the reference-config
  * translation and the dataset registry.
  */
class StreamSourceSpec extends SparkSpec {

  test("offset policy: 'beginning' (any case) → earliest, else latest (S2)") {
    def opts(off: String) = StreamSource.kafkaOptions(
      StreamConfig("ref1", "b:9092", Seq("t1"), initialOffset = off))
    assert(opts("beginning")("startingOffsets") == "earliest")
    assert(opts("BEGINNING")("startingOffsets") == "earliest")
    assert(opts("latest")("startingOffsets") == "latest")
    assert(opts("anything")("startingOffsets") == "latest")
  }

  test("topics join comma-separated; groupIdPrefix carries referenceName (S1/S3)") {
    val o = StreamSource.kafkaOptions(
      StreamConfig("orders_stream", "h1:9092,h2:9092", Seq("a", "b", "c"),
        minPartitions = Some(64)))
    assert(o("subscribe") == "a,b,c")
    assert(o("kafka.bootstrap.servers") == "h1:9092,h2:9092")
    assert(o("groupIdPrefix") == "graft-orders_stream")
    assert(o("minPartitions") == "64")
  }

  test("referenceName validation mirrors IdUtils.validateId") {
    assert(Lineage.isValidReferenceName("ok_name-123"))
    assert(!Lineage.isValidReferenceName("has space"))
    assert(!Lineage.isValidReferenceName("dot.dot"))
    assert(!Lineage.isValidReferenceName(""))
    intercept[IllegalArgumentException] {
      StreamSource.kafkaOptions(StreamConfig("bad name", "b", Seq("t")))
    }
  }

  test("decode stack is streaming-safe: csv decode on a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.formats.Decoders
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val raw = in.toDF().selectExpr("cast(value as binary) as value")
    val decoded = Decoders.decode(raw, "value", Some("csv"),
      Some("""{"type":"record","name":"r","fields":[
        {"name":"k","type":"string"},{"name":"v","type":"int"}]}"""))
    val q = decoded.writeStream.format("memory").queryName("dec_stream")
      .outputMode("append").start()
    try {
      in.addData("a,1", "b,2")
      q.processAllAvailable()
      val rows = spark.table("dec_stream").orderBy("k").collect()
      assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
        Seq(("a", 1), ("b", 2)))
    } finally q.stop()
  }

  test("register + listener: lineage records which datasets a query read (S5)") {
    val log = Lineage.installListener(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    Lineage.register(df, "region_ds")
    assert(Lineage.registered(spark).contains("region_ds"))
    // read through the registered view → action → listener fires
    spark.table("region_ds").filter("r_regionkey >= 0").collect()
    // QueryExecutionListener delivery is async; poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (log.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(log.size() > 0, "no lineage events recorded")
    assert(log.get(0)._1 == "region_ds")
  }
}

package graft.tools

import graft.GraftSession
import graft.sources.StreamSource
import org.apache.spark.sql.SparkSession

/** The standing S1 environmental ask, packaged ready-to-run: an
  * end-to-end `format("kafka")` smoke over [[StreamSource.read]] — the
  * one path `KafkaWireContractSpec` can only contract-test, because the
  * sandbox ships no spark-sql-kafka connector jar (zero egress, see
  * `StreamSource.decodeWire`'s doc). The day the environment provides
  * the jar (and a broker), this main IS the live test — no code needs
  * to change, which is the point of keeping everything downstream of
  * `load()` pinned to the documented wire schema.
  *
  * Run: `SPARK_GRAFT_KAFKA_BROKERS=host:9092 SPARK_GRAFT_KAFKA_TOPIC=t \
  *   sbt "runMain graft.tools.KafkaSmoke"`
  * Exit codes: 0 = read path drained rows end-to-end; 2 = broker/topic
  * env unset; 3 = connector jar absent (the current sandbox state —
  * reported, never faked).
  */
object KafkaSmoke {
  def main(args: Array[String]): Unit = {
    val connectorPresent =
      try {
        Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
        true
      } catch { case _: ClassNotFoundException => false }
    if (!connectorPresent) {
      System.err.println("[kafka-smoke] spark-sql-kafka connector is NOT on " +
        "the classpath — this sandbox has no Kafka path to exercise " +
        "(standing environmental ask; KafkaWireContractSpec carries the " +
        "wire-shape contract meanwhile)")
      sys.exit(3)
    }
    val brokers = sys.env.getOrElse("SPARK_GRAFT_KAFKA_BROKERS", "")
    val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "")
    if (brokers.isEmpty || topic.isEmpty) {
      System.err.println("[kafka-smoke] set SPARK_GRAFT_KAFKA_BROKERS and " +
        "SPARK_GRAFT_KAFKA_TOPIC to point at a live broker/topic")
      sys.exit(2)
    }
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = StreamSource.StreamConfig(
      referenceName = "kafka_smoke",
      brokers = brokers,
      topics = topic.split(",").toSeq,
      initialOffset = "beginning",  // read whatever the topic holds
      format = None)                // raw mode: payload as bytes
    val tmp = java.nio.file.Files.createTempDirectory("graft_kafka_smoke")
    val q = StreamSource.read(spark, cfg)
      .writeStream.format("memory").queryName("kafka_smoke")
      .outputMode("append")
      .option("checkpointLocation", tmp.toFile.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val n = spark.table("kafka_smoke").count()
    println(s"[kafka-smoke] drained $n records from '$topic' through " +
      "StreamSource.read (kafka load -> decodeWire)")
    spark.stop()
    if (n == 0) {
      System.err.println("[kafka-smoke] topic drained ZERO records — " +
        "produce test data first; an empty read proves connectivity only")
    }
  }
}

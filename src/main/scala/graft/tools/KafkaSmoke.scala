package graft.tools

import graft.GraftSession
import graft.sources.StreamSource
import graft.sources.kafka.{KafkaWireClient, KafkaWireProtocol, MiniKafkaBroker}
import org.apache.spark.sql.SparkSession

/** End-to-end Kafka smoke over [[StreamSource.read]]. Until round 11 this
  * main could only REPORT that no Kafka path existed (no spark-sql-kafka
  * jar, zero egress). The engine now carries its own wire implementation
  * ([[graft.sources.kafka.KafkaWireSourceProvider]] — the 0.9 protocol
  * the reference's source consumes, `MapRStreamingSource.java:70-94`), so
  * this main always has a live path:
  *
  *   - `SPARK_GRAFT_KAFKA_BROKERS`/`SPARK_GRAFT_KAFKA_TOPIC` set: drain
  *     that broker/topic through `StreamSource.read` (via the stock
  *     connector if its jar is present, the wire source otherwise).
  *   - env unset: self-contained smoke — start [[MiniKafkaBroker]] on an
  *     ephemeral port, produce over the real socket, drain, assert.
  *
  * Exit 0 = rows drained end to end; 1 = drained zero rows.
  */
object KafkaSmoke {
  def main(args: Array[String]): Unit = {
    val envBrokers = sys.env.getOrElse("SPARK_GRAFT_KAFKA_BROKERS", "")
    val envTopic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "")
    val selfContained = envBrokers.isEmpty || envTopic.isEmpty
    val broker = if (selfContained) {
      val b = new MiniKafkaBroker().start()
      b.createTopic("smoke", 2)
      val c = new KafkaWireClient("127.0.0.1", b.port)
      try {
        c.produce("smoke", 0, (0 until 5).map(i =>
          KafkaWireProtocol.WireMessage(0, s"k$i".getBytes("UTF-8"),
            s"value-$i".getBytes("UTF-8"))))
        c.produce("smoke", 1, (5 until 8).map(i =>
          KafkaWireProtocol.WireMessage(0, null, s"value-$i".getBytes("UTF-8"))))
      } finally c.close()
      Some(b)
    } else None
    val (brokers, topic) = broker match {
      case Some(b) => (b.bootstrapServers, "smoke")
      case None => (envBrokers, envTopic)
    }
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[kafka-smoke] reading via format '${StreamSource.kafkaFormat}' " +
      s"from $brokers topic '$topic'")
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
      "StreamSource.read (wire fetch -> decodeWire)")
    spark.stop()
    broker.foreach(_.close())
    if (n == 0) {
      System.err.println("[kafka-smoke] topic drained ZERO records — " +
        "produce test data first; an empty read proves connectivity only")
      sys.exit(1)
    }
  }
}

package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.StreamSource
import graft.sources.kafka.{KafkaWireClient, KafkaWireProtocol, MiniKafkaBroker}
import KafkaWireProtocol.WireMessage

/** S1 executed for real (SURVEY.md §2.1): `StreamSource.read` driving the
  * full Kafka-0.9 wire protocol over a live TCP socket — produce on the
  * wire, Metadata/Offsets/Fetch on the wire, decode, drain. This is the
  * end-to-end the environment could never host before round 11 (no
  * spark-sql-kafka jar, no embedded-kafka — ROUND11_NOTES.md holds the
  * verbatim resolution failures); the in-repo
  * [[graft.sources.kafka.KafkaWireSourceProvider]] closes the seam with
  * real bytes instead of a MemoryStream stand-in
  * (`KafkaWireContractSpec` keeps pinning the post-`load()` column
  * algebra; THIS spec pins `load()` itself).
  */
class KafkaWireE2ESpec extends SparkSpec {
  import spark.implicits._

  private def withBroker[T](f: MiniKafkaBroker => T): T = {
    val b = new MiniKafkaBroker().start()
    try f(b) finally b.close()
  }

  private def withClient[T](b: MiniKafkaBroker)(f: KafkaWireClient => T): T = {
    val c = new KafkaWireClient("127.0.0.1", b.port)
    try f(c) finally c.close()
  }

  private def drain(cfg: StreamSource.StreamConfig, name: String): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_wire_$name")
    val q = StreamSource.read(spark, cfg)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt.toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("read resolves to the wire source here (no connector jar) and keeps its option surface") {
    assert(!StreamSource.kafkaConnectorPresent)
    assert(StreamSource.kafkaFormat ==
      classOf[graft.sources.kafka.KafkaWireSourceProvider].getName)
  }

  test("text payloads: produce on the socket, drain partition-parallel, metadata exact") {
    withBroker { b =>
      b.createTopic("t_text", 2)
      withClient(b) { c =>
        c.produce("t_text", 0, Seq(
          WireMessage(0, "k0".getBytes(UTF_8), "hello".getBytes(UTF_8)),
          WireMessage(0, null, "world".getBytes(UTF_8))))
        c.produce("t_text", 1, Seq(
          WireMessage(0, "k2".getBytes(UTF_8), "wire".getBytes(UTF_8))))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_text", brokers = b.bootstrapServers,
        topics = Seq("t_text"), initialOffset = "beginning",
        format = Some("text"))
      drain(cfg, "e2e_text")
      val rows = spark.table("e2e_text")
        .select(col("topic"), col("partition"), col("offset"),
          col("key").cast("string"), col("message"))
        .as[(String, Int, Long, String, String)].collect().sortBy(r => (r._2, r._3))
      assert(rows.toSeq == Seq(
        ("t_text", 0, 0L, "k0", "hello"),
        ("t_text", 0, 1L, null, "world"),
        ("t_text", 1, 0L, "k2", "wire")))
    }
  }

  test("gzip-compressed produce decodes transparently on the wire (0.9 producer parity)") {
    withBroker { b =>
      b.createTopic("t_gz", 1)
      withClient(b) { c =>
        c.produceGzip("t_gz", 0, Seq(
          WireMessage(0, "a".getBytes(UTF_8), "compressed-1".getBytes(UTF_8)),
          WireMessage(0, null, "compressed-2".getBytes(UTF_8))))
        c.produce("t_gz", 0, Seq(
          WireMessage(0, null, "plain-3".getBytes(UTF_8))))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_gz", brokers = b.bootstrapServers,
        topics = Seq("t_gz"), initialOffset = "beginning",
        format = Some("text"))
      drain(cfg, "e2e_gz")
      val rows = spark.table("e2e_gz")
        .select(col("offset"), col("key").cast("string"), col("message"))
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(
        (0L, "a", "compressed-1"),
        (1L, null, "compressed-2"),
        (2L, null, "plain-3")))
    }
  }

  test("snappy-compressed produce decodes transparently on the wire (0.9 producer parity)") {
    withBroker { b =>
      b.createTopic("t_sn", 1)
      withClient(b) { c =>
        c.produceSnappy("t_sn", 0, Seq(
          WireMessage(0, "k".getBytes(UTF_8), "snappy-1".getBytes(UTF_8)),
          WireMessage(0, null, "snappy-2".getBytes(UTF_8))))
        c.produce("t_sn", 0, Seq(
          WireMessage(0, null, "plain-3".getBytes(UTF_8))))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_sn", brokers = b.bootstrapServers,
        topics = Seq("t_sn"), initialOffset = "beginning",
        format = Some("text"))
      drain(cfg, "e2e_sn")
      val rows = spark.table("e2e_sn")
        .select(col("offset"), col("key").cast("string"), col("message"))
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(
        (0L, "k", "snappy-1"),
        (1L, null, "snappy-2"),
        (2L, null, "plain-3")))
    }
  }

  test("lz4-compressed produce decodes transparently on the wire (0.9 producer parity)") {
    withBroker { b =>
      b.createTopic("t_lz", 1)
      withClient(b) { c =>
        c.produceLz4("t_lz", 0, Seq(
          WireMessage(0, "k".getBytes(UTF_8), "lz4-1".getBytes(UTF_8)),
          WireMessage(0, null, "lz4-2".getBytes(UTF_8))))
        c.produce("t_lz", 0, Seq(
          WireMessage(0, null, "plain-3".getBytes(UTF_8))))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_lz", brokers = b.bootstrapServers,
        topics = Seq("t_lz"), initialOffset = "beginning",
        format = Some("text"))
      drain(cfg, "e2e_lz")
      val rows = spark.table("e2e_lz")
        .select(col("offset"), col("key").cast("string"), col("message"))
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(
        (0L, "k", "lz4-1"),
        (1L, null, "lz4-2"),
        (2L, null, "plain-3")))
    }
  }

  test("csv decode end-to-end, and magic-1 timestamps surface as CREATE_TIME") {
    withBroker { b =>
      b.createTopic("t_csv", 1)
      val t0 = 1700000000000L
      withClient(b) { c =>
        c.produce("t_csv", 0, Seq(
          WireMessage(0, null, "alice,3".getBytes(UTF_8), magic = 1, timestampMs = t0),
          WireMessage(0, null, "bob,5".getBytes(UTF_8), magic = 1, timestampMs = t0 + 1000)))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_csv", brokers = b.bootstrapServers,
        topics = Seq("t_csv"), initialOffset = "beginning",
        format = Some("csv"),
        avroSchemaJson = Some("""{"type":"record","name":"r","fields":[
          {"name":"user","type":"string"},{"name":"amount","type":"int"}]}"""))
      drain(cfg, "e2e_csv")
      val rows = spark.table("e2e_csv")
        .select(col("offset"), col("user"), col("amount"),
          col("timestamp").cast("long"))
        .as[(Long, String, Int, Long)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(
        (0L, "alice", 3, t0 / 1000),
        (1L, "bob", 5, t0 / 1000 + 1)))
    }
  }

  test("magic-0 (the 0.9 record format) carries no timestamp: null column, type -1") {
    withBroker { b =>
      b.createTopic("t_m0", 1)
      withClient(b)(_.produce("t_m0", 0,
        Seq(WireMessage(0, null, "x".getBytes(UTF_8)))))
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_m0", brokers = b.bootstrapServers,
        topics = Seq("t_m0"), initialOffset = "beginning", format = None)
      // raw mode keeps no timestampType passthrough after decode — read
      // the wire frame directly for this fidelity check
      val ckpt = java.nio.file.Files.createTempDirectory("graft_wire_m0")
      val q = spark.readStream.format(StreamSource.kafkaFormat)
        .option("kafka.bootstrap.servers", cfg.brokers)
        .option("subscribe", "t_m0")
        .option("startingOffsets", "earliest")
        .load()
        .writeStream.format("memory").queryName("e2e_m0")
        .option("checkpointLocation", ckpt.toFile.getAbsolutePath)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val r = spark.table("e2e_m0")
        .select(col("timestamp").isNull, col("timestampType"))
        .as[(Boolean, Int)].collect().toSeq
      assert(r == Seq((true, -1)))
    }
  }

  test("avro payloads round-trip the wire (F5 through a socket)") {
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"user","type":"string"},{"name":"amount","type":"int"}]}"""
    // encode with the engine's own native expression, ship the bytes
    val payloads = Seq(("ada", 7), ("lin", 9)).toDF("user", "amount")
      .select(graft.functions.AvroExpressions
        .to_avro_graft(struct(col("user"), col("amount")), schema).as("b"))
      .as[Array[Byte]].collect()
    withBroker { b =>
      b.createTopic("t_avro", 1)
      withClient(b)(_.produce("t_avro", 0,
        payloads.map(p => WireMessage(0, null, p)).toSeq))
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_avro", brokers = b.bootstrapServers,
        topics = Seq("t_avro"), initialOffset = "beginning",
        format = Some("avro"), avroSchemaJson = Some(schema))
      drain(cfg, "e2e_avro")
      val rows = spark.table("e2e_avro").select(col("offset"), col("user"), col("amount"))
        .as[(Long, String, Int)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq((0L, "ada", 7), (1L, "lin", 9)))
    }
  }

  test("initialOffset latest skips the backlog; beginning reads it (the reference's offset policy)") {
    withBroker { b =>
      b.createTopic("t_off", 1)
      withClient(b)(_.produce("t_off", 0, (0 until 4).map(i =>
        WireMessage(0, null, s"old-$i".getBytes(UTF_8)))))
      val latest = StreamSource.StreamConfig(
        referenceName = "e2e_latest", brokers = b.bootstrapServers,
        topics = Seq("t_off"), initialOffset = "latest", format = Some("text"))
      drain(latest, "e2e_latest")
      assert(spark.table("e2e_latest").isEmpty)
      val beginning = latest.copy(referenceName = "e2e_begin", initialOffset = "beginning")
      drain(beginning, "e2e_begin")
      assert(spark.table("e2e_begin").count() == 4)
    }
  }

  test("checkpoint restart resumes from committed offsets, not the beginning") {
    withBroker { b =>
      b.createTopic("t_ck", 1)
      withClient(b)(_.produce("t_ck", 0, (0 until 3).map(i =>
        WireMessage(0, null, s"a$i".getBytes(UTF_8)))))
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_ck", brokers = b.bootstrapServers,
        topics = Seq("t_ck"), initialOffset = "beginning", format = Some("text"))
      // the memory sink cannot recover a checkpoint — restart semantics
      // need a durable sink, exactly as in production
      val ckpt = java.nio.file.Files.createTempDirectory("graft_wire_ck")
      val out = java.nio.file.Files.createTempDirectory("graft_wire_ck_out")
      def run(): Unit = {
        val q = StreamSource.read(spark, cfg)
          .writeStream.format("parquet")
          .outputMode("append")
          .option("path", out.toFile.getAbsolutePath)
          .option("checkpointLocation", ckpt.toFile.getAbsolutePath)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      assert(spark.read.parquet(out.toFile.getAbsolutePath).count() == 3)
      withClient(b)(_.produce("t_ck", 0, (3 until 5).map(i =>
        WireMessage(0, null, s"a$i".getBytes(UTF_8)))))
      run() // same checkpoint: only the 2 new records arrive
      val vals = spark.read.parquet(out.toFile.getAbsolutePath)
        .select(col("message")).as[String].collect().sorted
      assert(vals.toSeq == Seq("a0", "a1", "a2", "a3", "a4"),
        "restart must append exactly the new offsets, no re-read, no gap")
    }
  }

  test("multi-topic subscribe drains both topics in one stream") {
    withBroker { b =>
      b.createTopic("t_a", 1)
      b.createTopic("t_b", 1)
      withClient(b) { c =>
        c.produce("t_a", 0, Seq(WireMessage(0, null, "from-a".getBytes(UTF_8))))
        c.produce("t_b", 0, Seq(WireMessage(0, null, "from-b".getBytes(UTF_8))))
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_multi", brokers = b.bootstrapServers,
        topics = Seq("t_a", "t_b"), initialOffset = "beginning",
        format = Some("text"))
      drain(cfg, "e2e_multi")
      val rows = spark.table("e2e_multi").select(col("topic"), col("message"))
        .as[(String, String)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(("t_a", "from-a"), ("t_b", "from-b")))
    }
  }

  test("max_bytes cut: the reader survives partial trailing records and grows its fetch") {
    withBroker { b =>
      b.createTopic("t_big", 1)
      val big = ("x" * 4000).getBytes(UTF_8)
      withClient(b) { c =>
        c.produce("t_big", 0, (0 until 6).map(i => WireMessage(0, null, big)))
        // client-level check of the 0.9 cut rule: a small max_bytes
        // returns fewer whole messages (partial tail dropped), never junk
        val (_, first) = c.fetch("t_big", 0, 0L, maxBytes = 5000)
        assert(first.size == 1)
        // a cap below one whole message returns zero — the consumer's
        // grow-and-refetch trigger
        val (_, none) = c.fetch("t_big", 0, 0L, maxBytes = 100)
        assert(none.isEmpty)
      }
      val cfg = StreamSource.StreamConfig(
        referenceName = "e2e_big", brokers = b.bootstrapServers,
        topics = Seq("t_big"), initialOffset = "beginning", format = Some("text"))
      drain(cfg, "e2e_big")
      assert(spark.table("e2e_big").count() == 6)
    }
  }
}

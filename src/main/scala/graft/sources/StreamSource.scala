package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.formats.Decoders

/** Streaming source connector (SURVEY.md §2.1 S1-S3): the engine's
  * equivalent of the reference's MapRStream source
  * (`MapRStreamingSource.java:70-94`), re-expressed as Structured
  * Streaming's Kafka connector — MapR Streams is Kafka-0.9
  * wire-compatible, so the option surface maps 1:1.
  *
  * Reference-config parity (`MapRStreamConfig.java:38-47, 68-87`):
  *   - `topics`: comma-separated subscription (`MapRStreamingSource.java:86`)
  *   - `initialOffset`: "beginning"→earliest / anything else→latest,
  *     case-insensitive (`MapRStreamingSource.java:80-84`)
  *   - declared output schema + format decode: [[graft.formats.Decoders]]
  *     (F1-F9) applied to the `value` column at plan time
  *   - consumer group: the reference randomizes `group.id` per run
  *     (`MapRStreamingSource.java:74`, §1.4 quirk 5) so committed offsets
  *     never govern the start position; the Spark-native equivalent is
  *     checkpointed offsets + `groupIdPrefix` — restart-safe instead of
  *     restart-amnesiac.
  *
  * At scale: the direct stream's 1-RDD-partition-per-Kafka-partition
  * inheritance (`MapRStreamingSource.java:88-90`) holds for the Kafka
  * source too; `minPartitions` overrides it when topic partitioning is
  * coarser than the cluster.
  */
object StreamSource {

  /** Mirrors MapRStreamConfig (SURVEY.md §1.2): all values are plain
    * constructor parameters — the reference's `@Macro` runtime substitution
    * collapses to ordinary string interpolation at call time. */
  final case class StreamConfig(
      referenceName: String,
      brokers: String,
      topics: Seq[String],
      initialOffset: String = "latest", // "beginning" | "latest"
      format: Option[String] = None,
      avroSchemaJson: Option[String] = None,
      options: Map[String, String] = Map.empty,
      minPartitions: Option[Int] = None)

  /** Pure option mapping — unit-testable without a broker. */
  def kafkaOptions(cfg: StreamConfig): Map[String, String] = {
    require(Lineage.isValidReferenceName(cfg.referenceName),
      s"invalid referenceName '${cfg.referenceName}' (letters, digits, _, -)")
    require(cfg.topics.nonEmpty, "at least one topic")
    Map(
      "kafka.bootstrap.servers" -> cfg.brokers,
      "subscribe" -> cfg.topics.mkString(","),
      // reference: offsetField "beginning" (case-insensitive) → earliest,
      // anything else (incl. unset) → latest
      "startingOffsets" ->
        (if (cfg.initialOffset.equalsIgnoreCase("beginning")) "earliest" else "latest"),
      "groupIdPrefix" -> s"graft-${cfg.referenceName}"
    ) ++ cfg.minPartitions.map("minPartitions" -> _.toString)
  }

  /** The exact record schema Spark's Kafka source emits (its documented
    * connector contract, stable across Spark versions). Everything
    * downstream of `load()` consumes THIS shape and nothing else — which
    * is what makes the pipeline testable without a broker
    * ([[decodeWire]]) and lets `format("kafka")` drop in unchanged where
    * the connector jar is present. */
  val wireSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
  }

  /** The full post-`load()` pipeline over a wire-shaped frame (batch or
    * streaming — the decode is pure column algebra, identical in both):
    * metadata projection, payload decode per the declared format, lineage
    * registration. `read` is exactly `kafka load() andThen decodeWire`.
    *
    * Tested three ways: `KafkaWireContractSpec` drives this method with a
    * MemoryStream declared in [[wireSchema]] shape (pure column-algebra
    * contract), `KafkaWireE2ESpec` drives the full [[read]] path over a
    * real TCP socket against [[graft.sources.kafka.MiniKafkaBroker]], and
    * q8s runs the same wire path inside the oracle correctness gate. */
  def decodeWire(raw: DataFrame, cfg: StreamConfig): DataFrame = {
    val expected = wireSchema.fieldNames.toSet
    val got = raw.columns.toSet
    require(expected.subsetOf(got),
      s"not a Kafka wire frame: missing ${(expected -- got).mkString(",")}")
    val projected = raw
      .select("key", "topic", "partition", "offset", "timestamp", "value")
    val decoded = Decoders.decode(projected,
      format = cfg.format, avroSchema = cfg.avroSchemaJson, options = cfg.options)
    Lineage.register(decoded, cfg.referenceName)
    decoded
  }

  /** True when the stock spark-sql-kafka connector is on the classpath.
    * This sandbox ships without it (zero egress — ROUND11_NOTES.md holds
    * the verbatim resolution failures), so [[read]] resolves to the
    * in-repo [[graft.sources.kafka.KafkaWireSourceProvider]], which
    * speaks the same Kafka-0.9 wire protocol the reference consumes and
    * emits the identical [[wireSchema]] frame. Where the connector jar
    * IS present, `format("kafka")` is preferred unchanged — the decode
    * pipeline cannot tell the difference, which is the point of pinning
    * everything downstream of `load()` to the wire schema. */
  def kafkaConnectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  /** The format name [[read]] will load with in this environment. */
  def kafkaFormat: String =
    if (kafkaConnectorPresent) "kafka"
    else classOf[graft.sources.kafka.KafkaWireSourceProvider].getName

  /** Open the stream and decode the payload per the declared format —
    * returns a streaming DataFrame of metadata columns (topic, partition,
    * offset, timestamp, key) plus the decoded fields. */
  def read(spark: SparkSession, cfg: StreamConfig): DataFrame =
    decodeWire(
      kafkaOptions(cfg)
        .foldLeft(spark.readStream.format(kafkaFormat)) { case (r, (k, v)) => r.option(k, v) }
        .load(),
      cfg)
}

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

  /** Open the stream and decode the payload per the declared format —
    * returns a streaming DataFrame of metadata columns (topic, partition,
    * offset, timestamp, key) plus the decoded fields. */
  def read(spark: SparkSession, cfg: StreamConfig): DataFrame = {
    val raw = kafkaOptions(cfg)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .select("key", "topic", "partition", "offset", "timestamp", "value")
    val decoded = Decoders.decode(raw,
      format = cfg.format, avroSchema = cfg.avroSchemaJson, options = cfg.options)
    Lineage.register(decoded, cfg.referenceName)
    decoded
  }
}

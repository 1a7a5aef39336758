package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicInteger

import KafkaWireProtocol._

/** Blocking Kafka-0.9 wire client — the consumer/producer half of the
  * protocol [[MiniKafkaBroker]] serves, used from three places: the
  * driver (partition discovery + earliest/latest resolution when a
  * micro-batch is planned), the EXECUTORS (each input partition opens its
  * own connection and fetches its offset range — the 1-reader-per-Kafka-
  * partition parallelism the reference inherits from the direct stream,
  * `MapRStreamingSource.java:88-90`), and the specs' producers.
  *
  * One socket, sequential request/response (correlation ids verified),
  * no pooling — a reader task owns its connection for the task's
  * lifetime, which is the right shape at scale: connection setup
  * amortizes over the whole offset range, and there is no shared-client
  * contention point on the executor.
  */
final class KafkaWireClient(host: String, port: Int,
    clientId: String = "graft-wire") extends AutoCloseable {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val corr = new AtomicInteger(0)

  override def close(): Unit = socket.close()

  private def call(apiKey: Short, body: Array[Byte]): ByteBuffer = {
    val id = corr.incrementAndGet()
    val o = new Out
    writeHeader(o, RequestHeader(apiKey, 0, id, clientId))
    o.raw(body)
    val req = o.toBytes
    out.writeInt(req.length)
    out.write(req)
    out.flush()
    val size = in.readInt()
    val payload = new Array[Byte](size)
    in.readFully(payload)
    val bb = ByteBuffer.wrap(payload)
    val gotId = bb.getInt
    require(gotId == id, s"correlation id mismatch: sent $id got $gotId")
    bb
  }

  /** Partition ids per topic (empty request = all topics, per the v0
    * contract). Unknown topics surface as an error, not silence. */
  def partitionsFor(topics: Seq[String]): Map[String, Seq[Int]] = {
    val r = decodeMetadataResponse(call(ApiMetadata, encodeMetadataRequest(topics)))
    r.topics.map { t =>
      require(t.error == ErrNone, s"metadata error ${t.error} for topic ${t.name}")
      t.name -> t.partitions.map(_.id).sorted
    }.toMap
  }

  /** Offsets v0 single-partition lookup: time = [[KafkaWireProtocol.TimeLatest]]
    * for the log-end offset, [[KafkaWireProtocol.TimeEarliest]] for the start. */
  def offsetBefore(topic: String, partition: Int, time: Long): Long = {
    val r = decodeOffsetsResponse(call(ApiOffsets,
      encodeOffsetsRequest(OffsetsRequest(topic, Seq((partition, time, 1))))))
    val p = r.head._2.head
    require(p.error == ErrNone, s"offsets error ${p.error} for $topic-$partition")
    p.offsets.head
  }

  def earliest(topic: String, partition: Int): Long =
    offsetBefore(topic, partition, TimeEarliest)
  def latest(topic: String, partition: Int): Long =
    offsetBefore(topic, partition, TimeLatest)

  /** One Fetch round-trip from `offset` — returns (highWatermark,
    * messages). May return fewer messages than available (max_bytes cut);
    * callers loop. A partial trailing record was already dropped by
    * [[KafkaWireProtocol.decodeMessageSet]]. */
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20): (Long, Seq[WireMessage]) = {
    val r = decodeFetchResponse(call(ApiFetch, encodeFetchRequest(
      FetchRequest(maxWaitMs = 0, minBytes = 0, topic,
        Seq((partition, offset, maxBytes))))))
    val p = r.head._2.head
    require(p.error == ErrNone,
      s"fetch error ${p.error} for $topic-$partition at offset $offset")
    (p.highWatermark, decodeMessageSet(p.messageSet))
  }

  /** Produce a batch to one partition; returns the assigned base offset. */
  def produce(topic: String, partition: Int, msgs: Seq[WireMessage]): Long = {
    val r = decodeProduceResponse(call(ApiProduce, encodeProduceRequest(
      ProduceRequest(acks = 1, timeoutMs = 10000, topic,
        Seq((partition, encodeMessageSet(msgs)))))))
    val p = r.head._2.head
    require(p.error == ErrNone, s"produce error ${p.error} for $topic-$partition")
    p.baseOffset
  }

  /** Produce a batch as ONE gzip wrapper message — what a 0.9 producer
    * with compression.type=gzip puts on the wire. */
  def produceGzip(topic: String, partition: Int, msgs: Seq[WireMessage]): Long = {
    val r = decodeProduceResponse(call(ApiProduce, encodeProduceRequest(
      ProduceRequest(acks = 1, timeoutMs = 10000, topic,
        Seq((partition, gzipWrap(msgs)))))))
    val p = r.head._2.head
    require(p.error == ErrNone, s"produce error ${p.error} for $topic-$partition")
    p.baseOffset
  }

  /** Produce a batch as ONE snappy wrapper message — what a 0.9 producer
    * with compression.type=snappy puts on the wire (xerial framing). */
  def produceSnappy(topic: String, partition: Int, msgs: Seq[WireMessage]): Long = {
    val r = decodeProduceResponse(call(ApiProduce, encodeProduceRequest(
      ProduceRequest(acks = 1, timeoutMs = 10000, topic,
        Seq((partition, snappyWrap(msgs)))))))
    val p = r.head._2.head
    require(p.error == ErrNone, s"produce error ${p.error} for $topic-$partition")
    p.baseOffset
  }

  /** Produce a batch as ONE lz4 wrapper message — what a 0.9 producer
    * with compression.type=lz4 puts on the wire (frame format). */
  def produceLz4(topic: String, partition: Int, msgs: Seq[WireMessage]): Long = {
    val r = decodeProduceResponse(call(ApiProduce, encodeProduceRequest(
      ProduceRequest(acks = 1, timeoutMs = 10000, topic,
        Seq((partition, lz4Wrap(msgs)))))))
    val p = r.head._2.head
    require(p.error == ErrNone, s"produce error ${p.error} for $topic-$partition")
    p.baseOffset
  }
}

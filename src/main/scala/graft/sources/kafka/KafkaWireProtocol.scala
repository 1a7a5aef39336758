package graft.sources.kafka

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

/** Kafka 0.9 wire protocol codec — the exact on-the-wire byte layout the
  * reference's source consumes (SURVEY.md §2.1 S1: MapR Streams is
  * Kafka-0.9 wire-compatible, `MapRStreamingSource.java:70-94`), from the
  * PUBLIC protocol guide (kafka.apache.org/protocol): big-endian
  * primitives, `string` = int16 length + UTF-8 (-1 = null), `bytes` =
  * int32 length + raw (-1 = null), `array` = int32 count + elements.
  *
  * Implemented APIs (the complete 0.9 consumer+producer surface a direct
  * stream needs): Produce v0, Fetch v0, Offsets (ListOffsets) v0,
  * Metadata v0 — plus MessageSet v0 (magic 0, the 0.9 record format) and
  * v1 (magic 1, adds the int64 create-timestamp). CRC-32 covers the
  * message body from the magic byte on; decode VERIFIES it (a corrupt
  * fetch must fail loudly, not deliver garbage rows).
  *
  * Request envelope:  int32 size | int16 api_key | int16 api_version |
  *                    int32 correlation_id | string client_id | body
  * Response envelope: int32 size | int32 correlation_id | body
  *
  * Pure byte algebra — no sockets, no threads — shared verbatim by the
  * three parties that must agree on it: [[MiniKafkaBroker]] (server),
  * [[KafkaWireClient]] (driver/executor consumer), and the specs'
  * producers. One codec means a framing bug cannot hide: both ends would
  * shift identically only if the reference client (which this layout is
  * transcribed from the public guide to match) also shifted.
  */
object KafkaWireProtocol {

  val ApiProduce = 0: Short
  val ApiFetch = 1: Short
  val ApiOffsets = 2: Short
  val ApiMetadata = 3: Short

  val ErrNone = 0: Short
  val ErrOffsetOutOfRange = 1: Short
  val ErrUnknownTopicOrPartition = 3: Short

  /** Earliest/latest sentinels for Offsets v0 `time` (the 0.9 contract:
    * -1 = latest = log-end offset, -2 = earliest = log-start offset). */
  val TimeLatest = -1L
  val TimeEarliest = -2L

  /** One record as it travels the wire. `timestampMs` is meaningful only
    * for magic 1 (0.10 format); magic 0 — the 0.9 format — has none and
    * carries -1 here. Null key/value are modeled as null arrays (the
    * wire's -1-length encoding round-trips them). */
  final case class WireMessage(
      offset: Long,
      key: Array[Byte],
      value: Array[Byte],
      magic: Byte = 0,
      timestampMs: Long = -1L)

  final case class RequestHeader(
      apiKey: Short, apiVersion: Short, correlationId: Int, clientId: String)

  // ---------------------------------------------------------------- write

  final class Out {
    private val bos = new ByteArrayOutputStream(256)
    private val d = new DataOutputStream(bos)
    def i8(v: Byte): Out = { d.writeByte(v); this }
    def i16(v: Short): Out = { d.writeShort(v); this }
    def i32(v: Int): Out = { d.writeInt(v); this }
    def i64(v: Long): Out = { d.writeLong(v); this }
    def str(s: String): Out =
      if (s == null) i16(-1)
      else { val b = s.getBytes(UTF_8); i16(b.length.toShort); raw(b) }
    def bytes(b: Array[Byte]): Out =
      if (b == null) i32(-1) else { i32(b.length); raw(b) }
    def raw(b: Array[Byte]): Out = { d.write(b); this }
    def array[T](xs: Seq[T])(f: (Out, T) => Unit): Out = {
      i32(xs.size); xs.foreach(f(this, _)); this
    }
    def toBytes: Array[Byte] = { d.flush(); bos.toByteArray }
  }

  // ----------------------------------------------------------------- read

  def readString(bb: ByteBuffer): String = {
    val n = bb.getShort
    if (n < 0) null
    else { val b = new Array[Byte](n); bb.get(b); new String(b, UTF_8) }
  }

  def readBytes(bb: ByteBuffer): Array[Byte] = {
    val n = bb.getInt
    if (n < 0) null else { val b = new Array[Byte](n); bb.get(b); b }
  }

  def readArray[T](bb: ByteBuffer)(f: ByteBuffer => T): Seq[T] = {
    val n = bb.getInt
    (0 until n).map(_ => f(bb))
  }

  def readHeader(bb: ByteBuffer): RequestHeader =
    RequestHeader(bb.getShort, bb.getShort, bb.getInt, readString(bb))

  def writeHeader(o: Out, h: RequestHeader): Out =
    o.i16(h.apiKey).i16(h.apiVersion).i32(h.correlationId).str(h.clientId)

  // ----------------------------------------------------------- message set

  /** Encode messages as a v0/v1 MessageSet. Offsets are taken from each
    * [[WireMessage]] (producers conventionally send 0s; the broker
    * assigns real offsets on append, as Kafka does). */
  def encodeMessageSet(msgs: Seq[WireMessage]): Array[Byte] =
    encodeMessageSetAttr(msgs, 0)

  private def encodeMessageSetAttr(msgs: Seq[WireMessage], attr: Int): Array[Byte] = {
    val o = new Out
    msgs.foreach { m =>
      val body = new Out
      body.i8(m.magic).i8(attr.toByte)
      if (m.magic >= 1) body.i64(m.timestampMs)
      body.bytes(m.key).bytes(m.value)
      val b = body.toBytes
      val crc = new CRC32
      crc.update(b, 0, b.length)
      o.i64(m.offset)
      o.i32(4 + b.length)          // message size = crc + body
      o.i32(crc.getValue.toInt)    // CRC-32 of magic..end, as uint32
      o.raw(b)
    }
    o.toBytes
  }

  /** Wrap `msgs` into ONE gzip wrapper message, exactly as a 0.9 producer
    * with compression.type=gzip does: the inner set is a plain MessageSet
    * (producer-side inner offsets 0..n-1), gzip'd into the wrapper's
    * value; wrapper key is null, attributes low bits = 1 (gzip). The
    * wrapper's offset follows the broker convention of the LAST inner
    * message's absolute offset (on produce the broker reassigns it).
    * Reference behavior: kafka-clients 0.9 decompresses these wrappers
    * transparently inside the consumer's fetch iterator
    * (mapr-plugins MapRStreamingSource.java:77-78 inherits it). */
  def gzipWrap(msgs: Seq[WireMessage], wrapperOffset: Long = 0L): Array[Byte] = {
    require(msgs.nonEmpty, "empty compressed set")
    val inner = encodeMessageSetAttr(
      msgs.zipWithIndex.map { case (m, i) => m.copy(offset = i.toLong) }, 0)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(inner); gz.close()
    val magic = msgs.map(_.magic).max
    val ts = msgs.map(_.timestampMs).max
    encodeMessageSetAttr(
      Seq(WireMessage(wrapperOffset, null, bos.toByteArray, magic, ts)),
      attr = 1)
  }

  /** [[gzipWrap]]'s snappy twin: ONE snappy wrapper message (attributes
    * low bits = 2), value = the xerial-framed compression of the inner
    * plain MessageSet — byte-layout what a 0.9 producer with
    * compression.type=snappy emits (snappy-java SnappyOutputStream
    * framing; see [[Snappy]]). */
  def snappyWrap(msgs: Seq[WireMessage], wrapperOffset: Long = 0L): Array[Byte] = {
    require(msgs.nonEmpty, "empty compressed set")
    val inner = encodeMessageSetAttr(
      msgs.zipWithIndex.map { case (m, i) => m.copy(offset = i.toLong) }, 0)
    encodeMessageSetAttr(
      Seq(WireMessage(wrapperOffset, null, Snappy.compress(inner),
        msgs.map(_.magic).max, msgs.map(_.timestampMs).max)),
      attr = 2)
  }

  /** [[gzipWrap]]'s lz4 twin: ONE lz4 wrapper message (attributes low
    * bits = 3), value = the LZ4-framed compression of the inner plain
    * MessageSet — what a 0.9 producer with compression.type=lz4 emits
    * (KafkaLZ4BlockOutputStream; see [[Lz4]]). */
  def lz4Wrap(msgs: Seq[WireMessage], wrapperOffset: Long = 0L): Array[Byte] = {
    require(msgs.nonEmpty, "empty compressed set")
    val inner = encodeMessageSetAttr(
      msgs.zipWithIndex.map { case (m, i) => m.copy(offset = i.toLong) }, 0)
    encodeMessageSetAttr(
      Seq(WireMessage(wrapperOffset, null, Lz4.compress(inner),
        msgs.map(_.magic).max, msgs.map(_.timestampMs).max)),
      attr = 3)
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  /** Decode a MessageSet, verifying every CRC. A partial trailing message
    * (the broker's max_bytes cut mid-record — legal in 0.9) is dropped,
    * exactly as the real consumer does. Gzip wrapper messages (attributes
    * low bits = 1) are decompressed and their inner set decoded
    * recursively, with absolute offsets reconstructed from the wrapper
    * offset (= last inner message, the 0.9 broker convention) — matching
    * kafka-clients 0.9, whose fetch iterator decompresses transparently.
    * Snappy/LZ4 (codec bits 2/3) fail LOUDLY: silent compressed blobs as
    * record values are the worst failure mode. */
  def decodeMessageSet(bytes: Array[Byte]): Seq[WireMessage] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[WireMessage]
    while (bb.remaining >= 12 && {
      val offset = bb.getLong(bb.position())
      val size = bb.getInt(bb.position() + 8)
      if (bb.remaining - 12 < size) false
      else {
        bb.position(bb.position() + 12)
        val stored = bb.getInt
        val body = new Array[Byte](size - 4)
        bb.get(body)
        val crc = new CRC32
        crc.update(body, 0, body.length)
        require(crc.getValue.toInt == stored,
          s"CRC mismatch at offset $offset: wire-corrupt message")
        val mb = ByteBuffer.wrap(body)
        val magic = mb.get()
        val attr = mb.get()
        val ts = if (magic >= 1) mb.getLong else -1L
        val key = readBytes(mb)
        val value = readBytes(mb)
        (attr & 0x07) match {
          case 0 =>
            out += WireMessage(offset, key, value, magic, ts)
          case c @ (1 | 2 | 3) =>
            val name = c match {
              case 1 => "gzip"; case 2 => "snappy"; case _ => "lz4"
            }
            require(value != null,
              s"$name wrapper at offset $offset has null value")
            val inner = decodeMessageSet(c match {
              case 1 => gunzip(value)
              case 2 => Snappy.uncompress(value)
              case _ => Lz4.decompress(value)
            })
            require(inner.nonEmpty,
              s"$name wrapper at offset $offset decoded to an empty set")
            // wrapper offset = absolute offset of the LAST inner message
            val base = offset - (inner.size - 1)
            out ++= inner.zipWithIndex.map { case (m, i) =>
              m.copy(offset = base + i)
            }
          case c =>
            throw new IllegalArgumentException(
              s"unknown compression codec $c in message set at offset " +
                s"$offset: the 0.9 wire defines none/gzip/snappy/lz4 only")
        }
        true
      }
    }) ()
    out.result()
  }

  // ------------------------------------------------------------- metadata

  final case class PartitionMeta(id: Int, leader: Int)
  final case class TopicMeta(error: Short, name: String, partitions: Seq[PartitionMeta])
  final case class MetadataResponse(
      brokers: Seq[(Int, String, Int)], topics: Seq[TopicMeta])

  def encodeMetadataRequest(topics: Seq[String]): Array[Byte] =
    new Out().array(topics)((o, t) => o.str(t)).toBytes

  def decodeMetadataRequest(bb: ByteBuffer): Seq[String] =
    readArray(bb)(readString)

  def encodeMetadataResponse(r: MetadataResponse): Array[Byte] = {
    val o = new Out
    o.array(r.brokers) { case (oo, (id, host, port)) =>
      oo.i32(id).str(host).i32(port); ()
    }
    o.array(r.topics) { (oo, t) =>
      oo.i16(t.error).str(t.name)
      oo.array(t.partitions) { (ooo, p) =>
        // error, partition id, leader, replicas [leader], isr [leader]
        ooo.i16(ErrNone).i32(p.id).i32(p.leader)
        ooo.array(Seq(p.leader))((o4, r4) => { o4.i32(r4); () })
        ooo.array(Seq(p.leader))((o4, r4) => { o4.i32(r4); () })
        ()
      }
      ()
    }
    o.toBytes
  }

  def decodeMetadataResponse(bb: ByteBuffer): MetadataResponse = {
    val brokers = readArray(bb)(b => (b.getInt, readString(b), b.getInt))
    val topics = readArray(bb) { b =>
      val err = b.getShort
      val name = readString(b)
      val parts = readArray(b) { p =>
        p.getShort // per-partition error
        val id = p.getInt
        val leader = p.getInt
        readArray(p)(_.getInt) // replicas
        readArray(p)(_.getInt) // isr
        PartitionMeta(id, leader)
      }
      TopicMeta(err, name, parts)
    }
    MetadataResponse(brokers, topics)
  }

  // -------------------------------------------------------------- offsets

  final case class OffsetsRequest(
      topic: String, partitions: Seq[(Int, Long, Int)]) // (partition, time, maxN)

  def encodeOffsetsRequest(r: OffsetsRequest): Array[Byte] = {
    val o = new Out
    o.i32(-1) // replica_id: ordinary consumer
    o.array(Seq(r)) { (oo, t) =>
      oo.str(t.topic)
      oo.array(t.partitions) { case (ooo, (p, time, maxN)) =>
        ooo.i32(p).i64(time).i32(maxN); ()
      }
      ()
    }
    o.toBytes
  }

  def decodeOffsetsRequest(bb: ByteBuffer): Seq[OffsetsRequest] = {
    bb.getInt // replica_id
    readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b)(p => (p.getInt, p.getLong, p.getInt))
      OffsetsRequest(topic, parts)
    }
  }

  final case class PartitionOffsets(partition: Int, error: Short, offsets: Seq[Long])

  def encodeOffsetsResponse(byTopic: Seq[(String, Seq[PartitionOffsets])]): Array[Byte] = {
    val o = new Out
    o.array(byTopic) { case (oo, (topic, parts)) =>
      oo.str(topic)
      oo.array(parts) { (ooo, p) =>
        ooo.i32(p.partition).i16(p.error)
        ooo.array(p.offsets)((o4, off) => { o4.i64(off); () })
        ()
      }
      ()
    }
    o.toBytes
  }

  def decodeOffsetsResponse(bb: ByteBuffer): Seq[(String, Seq[PartitionOffsets])] =
    readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b) { p =>
        PartitionOffsets(p.getInt, p.getShort, readArray(p)(_.getLong))
      }
      (topic, parts)
    }

  // ---------------------------------------------------------------- fetch

  final case class FetchRequest(
      maxWaitMs: Int, minBytes: Int,
      topic: String, partitions: Seq[(Int, Long, Int)]) // (partition, offset, maxBytes)

  def encodeFetchRequest(r: FetchRequest): Array[Byte] = {
    val o = new Out
    o.i32(-1).i32(r.maxWaitMs).i32(r.minBytes)
    o.array(Seq(r)) { (oo, t) =>
      oo.str(t.topic)
      oo.array(t.partitions) { case (ooo, (p, off, maxB)) =>
        ooo.i32(p).i64(off).i32(maxB); ()
      }
      ()
    }
    o.toBytes
  }

  def decodeFetchRequest(bb: ByteBuffer): (Int, Int, Seq[FetchRequest]) = {
    bb.getInt // replica_id
    val maxWait = bb.getInt
    val minBytes = bb.getInt
    val topics = readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b)(p => (p.getInt, p.getLong, p.getInt))
      FetchRequest(maxWait, minBytes, topic, parts)
    }
    (maxWait, minBytes, topics)
  }

  final case class FetchPartition(
      partition: Int, error: Short, highWatermark: Long, messageSet: Array[Byte])

  def encodeFetchResponse(byTopic: Seq[(String, Seq[FetchPartition])]): Array[Byte] = {
    val o = new Out
    o.array(byTopic) { case (oo, (topic, parts)) =>
      oo.str(topic)
      oo.array(parts) { (ooo, p) =>
        ooo.i32(p.partition).i16(p.error).i64(p.highWatermark)
        ooo.i32(p.messageSet.length).raw(p.messageSet)
        ()
      }
      ()
    }
    o.toBytes
  }

  def decodeFetchResponse(bb: ByteBuffer): Seq[(String, Seq[FetchPartition])] =
    readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b) { p =>
        val id = p.getInt
        val err = p.getShort
        val hw = p.getLong
        val n = p.getInt
        val ms = new Array[Byte](n)
        p.get(ms)
        FetchPartition(id, err, hw, ms)
      }
      (topic, parts)
    }

  // -------------------------------------------------------------- produce

  final case class ProduceRequest(
      acks: Short, timeoutMs: Int,
      topic: String, partitions: Seq[(Int, Array[Byte])]) // (partition, messageSet)

  def encodeProduceRequest(r: ProduceRequest): Array[Byte] = {
    val o = new Out
    o.i16(r.acks).i32(r.timeoutMs)
    o.array(Seq(r)) { (oo, t) =>
      oo.str(t.topic)
      oo.array(t.partitions) { case (ooo, (p, ms)) =>
        ooo.i32(p).i32(ms.length).raw(ms); ()
      }
      ()
    }
    o.toBytes
  }

  def decodeProduceRequest(bb: ByteBuffer): (Short, Seq[ProduceRequest]) = {
    val acks = bb.getShort
    val timeout = bb.getInt
    val topics = readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b) { p =>
        val id = p.getInt
        val n = p.getInt
        val ms = new Array[Byte](n)
        p.get(ms)
        (id, ms)
      }
      ProduceRequest(acks, timeout, topic, parts)
    }
    (acks, topics)
  }

  final case class ProducePartition(partition: Int, error: Short, baseOffset: Long)

  def encodeProduceResponse(byTopic: Seq[(String, Seq[ProducePartition])]): Array[Byte] = {
    val o = new Out
    o.array(byTopic) { case (oo, (topic, parts)) =>
      oo.str(topic)
      oo.array(parts) { (ooo, p) =>
        ooo.i32(p.partition).i16(p.error).i64(p.baseOffset); ()
      }
      ()
    }
    o.toBytes
  }

  def decodeProduceResponse(bb: ByteBuffer): Seq[(String, Seq[ProducePartition])] =
    readArray(bb) { b =>
      val topic = readString(b)
      val parts = readArray(b)(p => ProducePartition(p.getInt, p.getShort, p.getLong))
      (topic, parts)
    }
}

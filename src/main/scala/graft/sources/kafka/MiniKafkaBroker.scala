package graft.sources.kafka

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import KafkaWireProtocol._

/** A minimal in-process broker speaking the Kafka 0.9 wire protocol over
  * a REAL TCP socket — the harness that lets S1 (SURVEY.md §2.1,
  * `MapRStreamingSource.java:70-94`) execute end to end in a zero-egress
  * sandbox where neither the spark-sql-kafka connector nor embedded-kafka
  * can resolve (the attempted resolutions and their verbatim failures are
  * in ROUND11_NOTES.md). Serves the four APIs a 0.9 consumer/producer
  * session uses: Metadata v0, Produce v0, Fetch v0, Offsets v0 — enough
  * for [[KafkaWireSourceProvider]] to run the reference's exact source
  * shape (discover partitions, resolve earliest/latest, fetch offset
  * ranges in parallel from executors) with bytes on a wire, not a mock.
  *
  * Dev/test harness, not a storage engine: logs are in-heap
  * `ArrayBuffer`s per partition (append = offset assignment, exactly
  * Kafka's log-end-offset rule), one thread per connection, no
  * replication (every partition leads on this node). Fetch honors
  * `max_bytes` by cutting the MessageSet — including mid-message, the
  * 0.9 partial-trailing-record behavior consumers must tolerate — and
  * returns OFFSET_OUT_OF_RANGE / UNKNOWN_TOPIC_OR_PARTITION error codes
  * per the public protocol guide.
  */
final class MiniKafkaBroker(nodeId: Int = 0) extends AutoCloseable {

  private val logs = TrieMap.empty[(String, Int), ArrayBuffer[WireMessage]]
  private val partitionCounts = TrieMap.empty[String, Int]
  private val running = new AtomicBoolean(false)
  @volatile private var server: ServerSocket = _
  @volatile private var acceptThread: Thread = _

  def createTopic(name: String, partitions: Int): Unit = {
    partitionCounts.put(name, partitions)
    (0 until partitions).foreach(p =>
      logs.putIfAbsent((name, p), ArrayBuffer.empty[WireMessage]))
  }

  def port: Int = server.getLocalPort
  def bootstrapServers: String = s"127.0.0.1:$port"

  /** Log-end offset (= next offset to be assigned = high watermark: no
    * replication lag in a single-node harness). */
  def endOffset(topic: String, partition: Int): Long =
    logs.get((topic, partition)).map(b => b.synchronized(b.length.toLong)).getOrElse(0L)

  def start(): MiniKafkaBroker = {
    server = new ServerSocket(0) // ephemeral port
    running.set(true)
    acceptThread = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "mini-kafka-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: SocketException => // closed during accept — shutting down
        }
      }
    }, "mini-kafka-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()
    this
  }

  override def close(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  private def serve(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (running.get()) {
        val size = in.readInt()
        val payload = new Array[Byte](size)
        in.readFully(payload)
        val bb = ByteBuffer.wrap(payload)
        val h = readHeader(bb)
        val body = h.apiKey match {
          case ApiMetadata => handleMetadata(bb)
          case ApiProduce  => handleProduce(bb)
          case ApiFetch    => handleFetch(bb)
          case ApiOffsets  => handleOffsets(bb)
          case k => throw new IllegalArgumentException(s"unsupported api_key $k")
        }
        out.writeInt(4 + body.length)
        out.writeInt(h.correlationId)
        out.write(body)
        out.flush()
      }
    } catch {
      case _: EOFException | _: SocketException => // client hung up — normal
    } finally sock.close()
  }

  private def handleMetadata(bb: ByteBuffer): Array[Byte] = {
    val asked = decodeMetadataRequest(bb)
    val names =
      if (asked.isEmpty) partitionCounts.keys.toSeq.sorted else asked
    val topics = names.map { t =>
      partitionCounts.get(t) match {
        case Some(n) =>
          TopicMeta(ErrNone, t, (0 until n).map(PartitionMeta(_, nodeId)))
        case None =>
          TopicMeta(ErrUnknownTopicOrPartition, t, Nil)
      }
    }
    encodeMetadataResponse(MetadataResponse(
      Seq((nodeId, "127.0.0.1", port)), topics))
  }

  private def handleProduce(bb: ByteBuffer): Array[Byte] = {
    val (_, reqs) = decodeProduceRequest(bb)
    val resp = reqs.map { r =>
      val parts = r.partitions.map { case (p, msBytes) =>
        logs.get((r.topic, p)) match {
          case Some(buf) =>
            val msgs = decodeMessageSet(msBytes)
            val base = buf.synchronized {
              val b = buf.length.toLong
              // broker assigns offsets on append: producer-sent offsets
              // are ignored, the log position is the truth (Kafka's rule)
              msgs.zipWithIndex.foreach { case (m, i) =>
                buf += m.copy(offset = b + i)
              }
              b
            }
            ProducePartition(p, ErrNone, base)
          case None => ProducePartition(p, ErrUnknownTopicOrPartition, -1L)
        }
      }
      (r.topic, parts)
    }
    encodeProduceResponse(resp)
  }

  private def handleFetch(bb: ByteBuffer): Array[Byte] = {
    val (_, _, reqs) = decodeFetchRequest(bb)
    val resp = reqs.map { r =>
      val parts = r.partitions.map { case (p, off, maxBytes) =>
        logs.get((r.topic, p)) match {
          case Some(buf) =>
            // honor max_bytes with the 0.9 cut rule: a MessageSet may
            // end mid-message; the consumer drops the partial tail and
            // re-fetches from the last whole offset with a bigger cap.
            // Encode message-by-message and stop once the cap is hit —
            // each poll is linear in bytes SERVED, not in log remaining.
            val (end, cut) = buf.synchronized {
              val e = buf.length.toLong
              if (off < 0 || off > e) (e, null)
              else {
                val out = new java.io.ByteArrayOutputStream()
                var i = off.toInt // safe: 0 <= off <= e = buf.length (Int)
                var partial = false
                while (i < buf.length && !partial) {
                  val one = encodeMessageSet(Seq(buf(i)))
                  if (out.size + one.length <= maxBytes) {
                    out.write(one); i += 1
                  } else {
                    out.write(one, 0, math.max(0, maxBytes - out.size))
                    partial = true
                  }
                }
                (e, out.toByteArray)
              }
            }
            if (cut == null) FetchPartition(p, ErrOffsetOutOfRange, end, Array.empty)
            else FetchPartition(p, ErrNone, end, cut)
          case None =>
            FetchPartition(p, ErrUnknownTopicOrPartition, -1L, Array.empty)
        }
      }
      (r.topic, parts)
    }
    encodeFetchResponse(resp)
  }

  private def handleOffsets(bb: ByteBuffer): Array[Byte] = {
    val reqs = decodeOffsetsRequest(bb)
    val resp = reqs.map { r =>
      val parts = r.partitions.map { case (p, time, maxN) =>
        logs.get((r.topic, p)) match {
          case Some(buf) =>
            val end = buf.synchronized(buf.length.toLong)
            val offs = time match {
              case TimeLatest   => Seq(end)
              case TimeEarliest => Seq(0L)
              // timestamp lookup is an 0.10.1+ (v1) concept; v0 returns
              // the log segments' offsets — a single-segment harness has
              // just [end, 0] truncated to max_num_offsets
              case _            => Seq(end, 0L).take(maxN)
            }
            PartitionOffsets(p, ErrNone, offs.take(math.max(maxN, 1)))
          case None => PartitionOffsets(p, ErrUnknownTopicOrPartition, Nil)
        }
      }
      (r.topic, parts)
    }
    encodeOffsetsResponse(resp)
  }
}

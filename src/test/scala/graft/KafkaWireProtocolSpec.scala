package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.kafka.KafkaWireProtocol._
import graft.sources.kafka.{KafkaWireOffset, KafkaWireProtocol}

/** Pure byte-level properties of the Kafka-0.9 codec — no sockets, no
  * Spark. Round-trips prove encode/decode agree on the exact layout for
  * arbitrary payloads (null keys, empty values, magic 0 and 1); the CRC
  * property proves a corrupt wire byte is an ERROR, not a silent bad row;
  * the offset-JSON property pins the checkpoint format the streaming
  * engine replays after restart. */
class KafkaWireProtocolSpec extends AnyFunSuite {

  /** Deterministic sample draw (the repo's PropSpec idiom — seeded, so a
    * failure reproduces). */
  private def samples[T](g: Gen[T], n: Int, seed: Long = 11L): List[T] =
    LazyList.iterate(Seed(seed))(_.next).take(n)
      .flatMap(s => g.apply(Gen.Parameters.default, s)).toList

  private val genBytes: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(null: Array[Byte]),
    Gen.choose(0, 64).flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)))

  private val genMsg: Gen[WireMessage] = for {
    off <- Gen.choose(0L, 1000000L)
    key <- genBytes
    value <- genBytes
    magic <- Gen.oneOf(0: Byte, 1: Byte)
    ts <- Gen.choose(0L, 2000000000000L)
  } yield WireMessage(off, key, value, magic, if (magic >= 1) ts else -1L)

  private def sameBytes(a: Array[Byte], b: Array[Byte]): Boolean =
    (a == null && b == null) || (a != null && b != null && a.sameElements(b))

  test("message sets round-trip byte-exactly (null keys, empty values, both magics)") {
    samples(Gen.listOfN(5, genMsg), 60).foreach { msgs =>
      val decoded = decodeMessageSet(encodeMessageSet(msgs))
      assert(decoded.size == msgs.size)
      decoded.zip(msgs).foreach { case (d, m) =>
        assert(d.offset == m.offset)
        assert(sameBytes(d.key, m.key))
        assert(sameBytes(d.value, m.value))
        assert(d.magic == m.magic)
        assert(d.timestampMs == m.timestampMs)
      }
    }
  }

  test("a flipped payload byte fails CRC verification loudly") {
    val bytes = encodeMessageSet(Seq(
      WireMessage(7, "k".getBytes, "some-payload".getBytes)))
    val corrupt = bytes.clone()
    corrupt(bytes.length - 3) = (corrupt(bytes.length - 3) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](decodeMessageSet(corrupt))
    assert(e.getMessage.contains("CRC"))
  }

  test("a partial trailing record is dropped, whole prefix kept (the 0.9 max_bytes cut)") {
    val msgs = (0 until 3).map(i => WireMessage(i.toLong, null, s"v$i".getBytes))
    val bytes = encodeMessageSet(msgs)
    // cut 5 bytes into the last record
    val cut = bytes.take(bytes.length - 5)
    val decoded = decodeMessageSet(cut)
    assert(decoded.map(_.offset) == Seq(0L, 1L))
  }

  test("request header round-trips") {
    samples(Gen.zip(Gen.choose(0, 3), Gen.choose(0, Int.MaxValue)), 40)
      .foreach { case (api, corr) =>
        val o = new Out
        writeHeader(o, RequestHeader(api.toShort, 0, corr, "client-x"))
        val h = readHeader(ByteBuffer.wrap(o.toBytes))
        assert(h == RequestHeader(api.toShort, 0, corr, "client-x"))
      }
  }

  test("fetch request/response round-trip") {
    val req = FetchRequest(100, 1, "topic-a", Seq((0, 42L, 65536), (3, 7L, 1024)))
    val (w, m, decoded) = decodeFetchRequest(ByteBuffer.wrap(encodeFetchRequest(req)))
    assert((w, m) == ((100, 1)))
    assert(decoded == Seq(req))
    val ms = encodeMessageSet(Seq(WireMessage(5, null, "v".getBytes)))
    val resp = Seq(("topic-a", Seq(
      FetchPartition(0, ErrNone, 99L, ms),
      FetchPartition(3, ErrOffsetOutOfRange, 7L, Array.empty[Byte]))))
    val back = decodeFetchResponse(ByteBuffer.wrap(encodeFetchResponse(resp)))
    assert(back.map { case (t, ps) => (t, ps.map(p => (p.partition, p.error, p.highWatermark))) } ==
      Seq(("topic-a", Seq((0, ErrNone, 99L), (3, ErrOffsetOutOfRange, 7L)))))
    assert(decodeMessageSet(back.head._2.head.messageSet).head.offset == 5L)
  }

  test("offsets and metadata bodies round-trip") {
    val oreq = OffsetsRequest("t", Seq((0, TimeLatest, 1), (1, TimeEarliest, 1)))
    assert(decodeOffsetsRequest(ByteBuffer.wrap(encodeOffsetsRequest(oreq))) == Seq(oreq))
    val oresp = Seq(("t", Seq(PartitionOffsets(0, ErrNone, Seq(12L)),
      PartitionOffsets(1, ErrUnknownTopicOrPartition, Nil))))
    assert(decodeOffsetsResponse(ByteBuffer.wrap(encodeOffsetsResponse(oresp))) == oresp)
    assert(decodeMetadataRequest(ByteBuffer.wrap(
      encodeMetadataRequest(Seq("a", "b")))) == Seq("a", "b"))
    val mresp = MetadataResponse(Seq((0, "127.0.0.1", 9092)), Seq(
      TopicMeta(ErrNone, "a", Seq(PartitionMeta(0, 0), PartitionMeta(1, 0))),
      TopicMeta(ErrUnknownTopicOrPartition, "zz", Nil)))
    assert(decodeMetadataResponse(ByteBuffer.wrap(encodeMetadataResponse(mresp))) == mresp)
  }

  test("produce bodies round-trip with the message set intact") {
    val ms = encodeMessageSet(Seq(WireMessage(0, "k".getBytes, "v".getBytes)))
    val req = ProduceRequest(1, 5000, "t", Seq((2, ms)))
    val (acks, back) = decodeProduceRequest(ByteBuffer.wrap(encodeProduceRequest(req)))
    assert(acks == 1)
    assert(back.head.topic == "t")
    assert(back.head.partitions.head._1 == 2)
    assert(back.head.partitions.head._2.sameElements(ms))
    val resp = Seq(("t", Seq(ProducePartition(2, ErrNone, 17L))))
    assert(decodeProduceResponse(ByteBuffer.wrap(encodeProduceResponse(resp))) == resp)
  }

  test("checkpoint offsets serialize canonically and round-trip") {
    val o = KafkaWireOffset(Map(
      "zz" -> Map(1 -> 5L, 0 -> 3L),
      "aa" -> Map(10 -> 7L, 2 -> 0L)))
    // sorted topics, numerically sorted partitions — the same position
    // always produces the same checkpoint bytes
    assert(o.json() == """{"aa":{"2":0,"10":7},"zz":{"0":3,"1":5}}""")
    assert(KafkaWireOffset.fromJson(o.json()) == o)
    assert(KafkaWireOffset.fromJson("{}") == KafkaWireOffset(Map.empty))
  }

  test("a checkpoint whose topic would be dropped by the parser fails loudly") {
    // a topic name with '"' serializes but cannot parse back — silent
    // offset-0 restart is the failure mode this guards against
    val bad = KafkaWireOffset(Map("t\"x" -> Map(0 -> 4L))).json()
    val e = intercept[IllegalArgumentException](KafkaWireOffset.fromJson(bad))
    assert(e.getMessage.contains("round-trip"))
  }

  test("gzip wrapper messages decode to the inner set with reconstructed offsets") {
    samples(Gen.listOfN(4, genMsg), 40).foreach { msgs0 =>
      // inner values must be non-null for equality (null value is legal
      // but the wrapper path never produces it from a real producer batch)
      val msgs = msgs0.zipWithIndex.map { case (m, i) =>
        m.copy(value = if (m.value == null) Array[Byte]() else m.value)
      }
      val wrapperOffset = 100L + msgs.size - 1
      val decoded = decodeMessageSet(gzipWrap(msgs, wrapperOffset))
      assert(decoded.size == msgs.size)
      decoded.zip(msgs).zipWithIndex.foreach { case ((d, m), i) =>
        // absolute offsets: wrapper = last inner (0.9 broker convention)
        assert(d.offset == 100L + i)
        assert(sameBytes(d.key, m.key))
        assert(sameBytes(d.value, m.value))
      }
    }
  }

  test("gzip wrappers survive the broker's max_bytes partial-tail cut") {
    val msgs = (0 until 3).map(i =>
      WireMessage(i.toLong, null, s"payload-number-$i".getBytes))
    val wrapped = gzipWrap(msgs, 2L)
    val plain = encodeMessageSet(Seq(WireMessage(3L, null, "after".getBytes)))
    val stream = wrapped ++ plain
    // cut mid-second-record: wrapper decodes whole, partial tail dropped
    val cut = stream.take(wrapped.length + 5)
    val decoded = decodeMessageSet(cut)
    assert(decoded.map(_.offset) == Seq(0L, 1L, 2L))
    assert(decoded.map(m => new String(m.value)) ==
      Seq("payload-number-0", "payload-number-1", "payload-number-2"))
  }

  test("compressed gibberish fails loudly per codec; unknown codec bits rejected") {
    def wrapper(codec: Int): Array[Byte] = {
      val body = new Out
      body.i8(0).i8(codec.toByte)
      body.bytes(null).bytes("compressed-gibberish".getBytes)
      val b = body.toBytes
      val crc = new java.util.zip.CRC32
      crc.update(b, 0, b.length)
      val o = new Out
      o.i64(0L).i32(4 + b.length).i32(crc.getValue.toInt).raw(b)
      o.toBytes
    }
    // codecs 2/3 now DECODE — but gibberish must still die loudly, not
    // surface as a corrupt row value
    val e2 = intercept[IllegalArgumentException](decodeMessageSet(wrapper(2)))
    assert(e2.getMessage.contains("snappy"))
    val e3 = intercept[IllegalArgumentException](decodeMessageSet(wrapper(3)))
    assert(e3.getMessage.contains("lz4"))
    val e4 = intercept[IllegalArgumentException](decodeMessageSet(wrapper(4)))
    assert(e4.getMessage.contains("unknown compression codec"))
  }

  // ------------------------------------------------------------- snappy

  test("snappy golden vectors: copy ops with 1/2/4-byte offsets, overlap RLE, long literal") {
    import graft.sources.kafka.Snappy
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // literal "ab" + copy-1 (len 8, off 2): the overlapping RLE idiom
    assert(new String(Snappy.uncompressBlock(
      bytes(10, 0x04, 'a', 'b', 0x11, 0x02))) == "ababababab")
    // literal "abcd" + copy-2 (len 4, off 4 LE)
    assert(new String(Snappy.uncompressBlock(
      bytes(8, 0x0c, 'a', 'b', 'c', 'd', 0x0e, 0x04, 0x00))) == "abcdabcd")
    // literal "abcd" + copy-4 (len 4, off 4 LE32)
    assert(new String(Snappy.uncompressBlock(
      bytes(8, 0x0c, 'a', 'b', 'c', 'd', 0x0f, 0x04, 0x00, 0x00, 0x00)))
      == "abcdabcd")
    // long literal: tag 0xf0 = 1 extra length byte, value 69 → len 70
    val seventy = Array.tabulate(70)(i => ('a' + i % 26).toByte)
    assert(Snappy.uncompressBlock(
      bytes(70, 0xf0, 69) ++ seventy).sameElements(seventy))
  }

  test("snappy malformed input dies loudly: bad offsets, overruns, length lies") {
    import graft.sources.kafka.Snappy
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // copy before any output (offset > produced)
    intercept[IllegalArgumentException](
      Snappy.uncompressBlock(bytes(4, 0x11, 0x02)))
    // literal overruns the promised length
    intercept[IllegalArgumentException](
      Snappy.uncompressBlock(bytes(1, 0x04, 'a', 'b')))
    // block decodes short of the promised length
    intercept[IllegalArgumentException](
      Snappy.uncompressBlock(bytes(9, 0x04, 'a', 'b')))
    // xerial frame whose block length overruns the buffer
    val bad = Array[Byte](0x82.toByte, 'S', 'N', 'A', 'P', 'P', 'Y', 0x0,
      0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 99, 1, 2)
    intercept[IllegalArgumentException](Snappy.uncompress(bad))
  }

  test("snappy round-trips: raw block, xerial multi-block, empty, unframed fallback") {
    import graft.sources.kafka.Snappy
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 59, 60, 61, 1000, 40 * 1024, 70 * 1024)) {
      val data = new Array[Byte](n); rnd.nextBytes(data)
      assert(Snappy.uncompress(Snappy.compress(data)).sameElements(data),
        s"xerial round-trip failed at n=$n")
      assert(Snappy.uncompressBlock(Snappy.compressBlock(data))
        .sameElements(data), s"raw-block round-trip failed at n=$n")
      // unframed values (pre-xerial producers) decode via the fallback
      assert(Snappy.uncompress(Snappy.compressBlock(data))
        .sameElements(data), s"unframed fallback failed at n=$n")
    }
  }

  // ---------------------------------------------------------------- lz4

  test("xxHash32 matches the published reference vectors") {
    import graft.sources.kafka.Lz4
    def h(s: String): Int = Lz4.xxHash32(s.getBytes, 0, s.length, 0)
    assert(h("") == 0x02cc5d05)
    assert(h("a") == 0x550d7456)
    assert(h("abc") == 0x32d153ff)
  }

  test("lz4 golden vectors: match copy, overlap RLE, literal-only tail") {
    import graft.sources.kafka.Lz4
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // token lit=4/match=0(+4), offset 4 → "abcdabcd"
    assert(new String(Lz4.decompressBlock(
      bytes(0x40, 'a', 'b', 'c', 'd', 0x04, 0x00), 8)) == "abcdabcd")
    // token lit=1/match=3(+4), offset 1 → 8 × 'a' (overlap RLE)
    assert(new String(Lz4.decompressBlock(
      bytes(0x13, 'a', 0x01, 0x00), 8)) == "aaaaaaaa")
    // literal-only final sequence
    assert(new String(Lz4.decompressBlock(
      bytes(0x30, 'x', 'y', 'z'), 3)) == "xyz")
    // 15+ literal length extension: 15 + 5 = 20 literals
    val lits = Array.tabulate(20)(i => ('a' + i).toByte)
    assert(Lz4.decompressBlock(bytes(0xf0, 5) ++ lits, 20).sameElements(lits))
  }

  test("lz4 malformed input dies loudly: bad offsets, overruns, bad frames") {
    import graft.sources.kafka.Lz4
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // match before any output
    intercept[IllegalArgumentException](
      Lz4.decompressBlock(bytes(0x03, 0x01, 0x00), 7))
    // literal overruns the promised length
    intercept[IllegalArgumentException](
      Lz4.decompressBlock(bytes(0x30, 'x', 'y', 'z'), 2))
    // decodes short of the promised length
    intercept[IllegalArgumentException](
      Lz4.decompressBlock(bytes(0x30, 'x', 'y', 'z'), 9))
    // bad frame magic
    intercept[IllegalArgumentException](
      Lz4.decompress("not-an-lz4-frame".getBytes))
    // good magic, corrupt header checksum
    val good = Lz4.compress("payload".getBytes)
    val bad = good.clone(); bad(6) = (bad(6) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Lz4.decompress(bad))
    assert(e.getMessage.contains("header checksum"))
  }

  test("lz4 frame round-trips, incl. the KAFKA-3160 magic-inclusive checksum variant") {
    import graft.sources.kafka.Lz4
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 100, 64 * 1024, 100 * 1024)) {
      val data = new Array[Byte](n); rnd.nextBytes(data)
      assert(Lz4.decompress(Lz4.compress(data)).sameElements(data),
        s"frame round-trip failed at n=$n")
      // rewrite the header checksum to kafka-0.9's buggy value (covers
      // the magic) — the decoder must accept BOTH
      val f = Lz4.compress(data)
      f(6) = ((Lz4.xxHash32(f, 0, 6, 0) >> 8) & 0xff).toByte
      assert(Lz4.decompress(f).sameElements(data),
        s"kafka-checksum variant failed at n=$n")
    }
  }

  test("snappy wrapper messages decode with reconstructed offsets (gzip parity)") {
    samples(Gen.listOfN(4, genMsg), 40).foreach { msgs0 =>
      val msgs = msgs0.map { m =>
        m.copy(value = if (m.value == null) Array[Byte]() else m.value)
      }
      val wrapperOffset = 100L + msgs.size - 1
      val decoded = decodeMessageSet(snappyWrap(msgs, wrapperOffset))
      assert(decoded.size == msgs.size)
      decoded.zip(msgs).zipWithIndex.foreach { case ((d, m), i) =>
        assert(d.offset == 100L + i)
        assert(sameBytes(d.key, m.key))
        assert(sameBytes(d.value, m.value))
      }
    }
  }

  test("lz4 wrapper messages decode with reconstructed offsets (gzip parity)") {
    samples(Gen.listOfN(4, genMsg), 40).foreach { msgs0 =>
      val msgs = msgs0.map { m =>
        m.copy(value = if (m.value == null) Array[Byte]() else m.value)
      }
      val wrapperOffset = 100L + msgs.size - 1
      val decoded = decodeMessageSet(lz4Wrap(msgs, wrapperOffset))
      assert(decoded.size == msgs.size)
      decoded.zip(msgs).zipWithIndex.foreach { case ((d, m), i) =>
        assert(d.offset == 100L + i)
        assert(sameBytes(d.key, m.key))
        assert(sameBytes(d.value, m.value))
      }
    }
  }
}

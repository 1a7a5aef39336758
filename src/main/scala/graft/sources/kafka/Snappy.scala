package graft.sources.kafka

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM snappy decode for the Kafka-0.9 wire source.
  *
  * The reference's kafka-clients-0.9 consumer transparently decodes
  * snappy-compressed wrapper messages (snappy-java on the classpath,
  * mapr-plugins pom.xml:132-136; MapRStreamingSource.java:77-78 inherits
  * the fetch iterator's decompression). `graft-kafka` previously
  * loud-rejected codec 2; this module closes that parity gap with a
  * from-scratch decoder for both layers a 0.9 producer emits:
  *
  *   - the RAW snappy block format (Google's format description,
  *     github.com/google/snappy/blob/main/format_description.txt):
  *     varint32 uncompressed length, then a tag stream of literals and
  *     back-references (1/2/4-byte offsets, overlapping copies legal);
  *   - the XERIAL STREAM framing snappy-java's SnappyOutputStream writes
  *     (what kafka 0.9's Compressor wraps values in): 8-byte magic
  *     {0x82 S N A P P Y 0x0}, two int32s (version, compat), then
  *     [int32-BE block length][raw snappy block] chunks.
  *
  * Unframed values are treated as one raw block (pre-xerial producers).
  * Every structural violation throws — a silent wrong-bytes decode is
  * the worst failure mode for a wire source. The compress side emits
  * all-literal blocks (always-valid snappy, no matcher): the engine
  * needs decode parity, not ratio — and the spec's golden vectors pin
  * the copy-op paths the literal encoder cannot reach.
  */
object Snappy {

  private val XerialMagic: Array[Byte] =
    Array(0x82.toByte, 'S', 'N', 'A', 'P', 'P', 'Y', 0x0)

  // ------------------------------------------------------------ raw block

  /** Decode one raw snappy block. */
  def uncompressBlock(in: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(in)
    val outLen = readVarint32(bb)
    require(outLen >= 0 && outLen <= (1 << 30),
      s"snappy: implausible uncompressed length $outLen")
    val out = new Array[Byte](outLen)
    var op = 0
    while (bb.remaining > 0) {
      val tag = bb.get() & 0xff
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >> 2) + 1
          if (len > 60) {
            val extra = len - 60 // 1..4 length bytes, little-endian
            require(bb.remaining >= extra, "snappy: truncated literal length")
            var v = 0L
            for (i <- 0 until extra) v |= (bb.get() & 0xffL) << (8 * i)
            len = v.toInt + 1
          }
          require(len > 0 && bb.remaining >= len && op + len <= outLen,
            s"snappy: literal overruns block (len=$len at out=$op/$outLen)")
          bb.get(out, op, len)
          op += len
        case 1 => // copy, 1-byte offset, len 4..11, offset 11 bits
          require(bb.remaining >= 1, "snappy: truncated copy-1")
          val len = 4 + ((tag >> 2) & 0x7)
          val off = ((tag >> 5) << 8) | (bb.get() & 0xff)
          copy(out, op, off, len, outLen); op += len
        case 2 => // copy, 2-byte LE offset, len 1..64
          require(bb.remaining >= 2, "snappy: truncated copy-2")
          val len = (tag >> 2) + 1
          val off = (bb.get() & 0xff) | ((bb.get() & 0xff) << 8)
          copy(out, op, off, len, outLen); op += len
        case _ => // copy, 4-byte LE offset, len 1..64
          require(bb.remaining >= 4, "snappy: truncated copy-4")
          val len = (tag >> 2) + 1
          var off = 0L
          for (i <- 0 until 4) off |= (bb.get() & 0xffL) << (8 * i)
          copy(out, op, off.toInt, len, outLen); op += len
      }
    }
    require(op == outLen,
      s"snappy: block decoded to $op bytes, header promised $outLen")
    out
  }

  private def copy(out: Array[Byte], op: Int, off: Int, len: Int,
      outLen: Int): Unit = {
    require(off > 0 && off <= op,
      s"snappy: copy offset $off outside produced output $op")
    require(op + len <= outLen,
      s"snappy: copy overruns block (len=$len at out=$op/$outLen)")
    // overlapping copies (off < len) are the RLE idiom: byte-by-byte
    var i = 0
    while (i < len) { out(op + i) = out(op + i - off); i += 1 }
  }

  /** All-literal raw snappy block (always valid; no match search). */
  def compressBlock(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length + 8)
    writeVarint32(bos, in.length)
    var p = 0
    while (p < in.length) {
      val len = math.min(60, in.length - p) // 1-byte tag literals only
      bos.write(((len - 1) << 2) | 0)
      bos.write(in, p, len)
      p += len
    }
    bos.toByteArray
  }

  // -------------------------------------------------------- xerial stream

  /** Decode a snappy value as kafka-clients 0.9 does: xerial-framed if
    * the magic matches, else one raw block. */
  def uncompress(in: Array[Byte]): Array[Byte] = {
    if (in.length >= 16 && XerialMagic.indices.forall(i => in(i) == XerialMagic(i))) {
      val bb = ByteBuffer.wrap(in).order(ByteOrder.BIG_ENDIAN)
      bb.position(8)
      val version = bb.getInt
      val compat = bb.getInt
      require(version >= 1 && compat >= 1 && compat <= version,
        s"snappy: implausible xerial header version=$version compat=$compat")
      val bos = new java.io.ByteArrayOutputStream(in.length * 2)
      while (bb.remaining > 0) {
        require(bb.remaining >= 4, "snappy: truncated xerial block header")
        val blen = bb.getInt
        require(blen > 0 && blen <= bb.remaining,
          s"snappy: xerial block length $blen exceeds remaining ${bb.remaining}")
        val block = new Array[Byte](blen)
        bb.get(block)
        bos.write(uncompressBlock(block))
      }
      bos.toByteArray
    } else uncompressBlock(in)
  }

  /** Xerial-framed all-literal compress — what the test producer and
    * MiniKafkaBroker use to exercise the consumer path with real
    * framing (32 KiB blocks, snappy-java's default). */
  def compress(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length + 64)
    bos.write(XerialMagic, 0, XerialMagic.length)
    writeInt32BE(bos, 1) // version
    writeInt32BE(bos, 1) // min compatible version
    val BlockSize = 32 * 1024
    var p = 0
    while (p < in.length || p == 0) {
      val len = math.min(BlockSize, in.length - p)
      val block = compressBlock(java.util.Arrays.copyOfRange(in, p, p + len))
      writeInt32BE(bos, block.length)
      bos.write(block, 0, block.length)
      p += len
      if (in.length == 0) return bos.toByteArray
    }
    bos.toByteArray
  }

  // -------------------------------------------------------------- varint

  private def readVarint32(bb: ByteBuffer): Int = {
    var v = 0L
    var shift = 0
    var b = 0
    do {
      require(bb.remaining > 0 && shift <= 28, "snappy: malformed varint")
      b = bb.get() & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v.toInt
  }

  private def writeVarint32(o: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { o.write((v & 0x7f) | 0x80); v >>>= 7 }
    o.write(v)
  }

  private def writeInt32BE(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 24) & 0xff); o.write((v >>> 16) & 0xff)
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
}

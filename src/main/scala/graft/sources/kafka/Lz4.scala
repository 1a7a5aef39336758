package graft.sources.kafka

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM LZ4 decode for the Kafka-0.9 wire source — the last codec
  * the reference's kafka-clients-0.9 consumer handles (lz4-java on the
  * classpath via kafka-clients; mapr-plugins pom.xml:132-136 inherits
  * it) that `graft-kafka` previously loud-rejected.
  *
  * Two layers, both from public specs:
  *
  *   - the LZ4 BLOCK format (github.com/lz4/lz4/blob/dev/doc/
  *     lz4_Block_format.md): sequences of [token][literals][offset,
  *     matchlen] — token high nibble = literal length (15 ⇒ extension
  *     bytes of 255), low nibble = match length − 4, offset 2-byte LE,
  *     overlapping matches legal (the RLE idiom);
  *   - the LZ4 FRAME format v1 (lz4_Frame_format.md) as kafka 0.9's
  *     KafkaLZ4BlockOutputStream writes it: magic 0x184D2204, FLG/BD
  *     descriptor, 1-byte header checksum, then blocks of
  *     [int32-LE size][data] where the size's HIGH BIT set means the
  *     block is stored uncompressed; 0x00000000 terminates. Kafka 0.9
  *     famously computed the header checksum INCLUSIVE of the magic
  *     (KAFKA-3160); since content checksums are off and the descriptor
  *     carries no content size, the checksum byte is the only
  *     divergence — this decoder accepts both the spec value and the
  *     0.9 value and rejects anything else, loudly.
  *
  * No external libs: the only moving part the frame needs beyond the
  * block decoder is xxHash32 for the header checksum, implemented from
  * the public algorithm spec (github.com/Cyan4973/xxHash/blob/dev/doc/
  * xxhash_spec.md). Compress side emits all-literal blocks (always
  * valid; the engine needs decode parity, not ratio) — golden vectors
  * in the spec pin the match/copy paths the literal encoder can't
  * reach.
  */
object Lz4 {

  private val Magic = 0x184d2204

  // ------------------------------------------------------------- block

  /** Decode one LZ4 block into exactly `outLen` bytes. */
  def decompressBlock(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = 0
    var op = 0
    def ext(base: Int): Int = { // 15-extension: add 255-bytes + final
      var len = base
      if (base == 15) {
        var b = 0
        do {
          require(ip < in.length, "lz4: truncated length extension")
          b = in(ip) & 0xff; ip += 1; len += b
        } while (b == 255)
      }
      len
    }
    while (ip < in.length) {
      val token = in(ip) & 0xff; ip += 1
      val litLen = ext(token >> 4)
      require(ip + litLen <= in.length && op + litLen <= outLen,
        s"lz4: literal overruns block (len=$litLen at out=$op/$outLen)")
      System.arraycopy(in, ip, out, op, litLen)
      ip += litLen; op += litLen
      if (ip == in.length) {
        // last sequence is literal-only (spec: block ends after literals)
        require(op == outLen,
          s"lz4: block decoded to $op bytes, expected $outLen")
        return out
      }
      require(ip + 2 <= in.length, "lz4: truncated match offset")
      val off = (in(ip) & 0xff) | ((in(ip + 1) & 0xff) << 8); ip += 2
      require(off > 0 && off <= op,
        s"lz4: match offset $off outside produced output $op")
      val matchLen = ext(token & 0xf) + 4
      require(op + matchLen <= outLen,
        s"lz4: match overruns block (len=$matchLen at out=$op/$outLen)")
      var i = 0
      while (i < matchLen) { out(op + i) = out(op + i - off); i += 1 }
      op += matchLen
    }
    require(op == outLen, s"lz4: block decoded to $op bytes, expected $outLen")
    out
  }

  /** All-literal LZ4 block (one literal-only sequence; always valid). */
  def compressBlock(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length + 8)
    var len = in.length
    if (len < 15) bos.write(len << 4)
    else {
      bos.write(0xf0)
      var rest = len - 15
      while (rest >= 255) { bos.write(255); rest -= 255 }
      bos.write(rest)
    }
    bos.write(in, 0, in.length)
    bos.toByteArray
  }

  // ------------------------------------------------------------- frame

  /** Decode an LZ4 frame as kafka-clients 0.9 does (accepting both the
    * spec header checksum and the KAFKA-3160 magic-inclusive one). */
  def decompress(in: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.wrap(in).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining >= 7, "lz4: frame shorter than any valid header")
    require(bb.getInt == Magic,
      "lz4: bad frame magic — not a KafkaLZ4BlockOutputStream value")
    val flg = bb.get() & 0xff
    val bd = bb.get() & 0xff
    val version = (flg >> 6) & 0x3
    require(version == 1, s"lz4: unsupported frame version $version")
    // bit 5 (block independence): 0.9 writes independent blocks; a
    // dependent-block frame decodes identically here because the output
    // buffer is contiguous per block and matches never cross blocks in
    // practice for 0.9 producers
    val contentChecksum = ((flg >> 2) & 1) == 1
    val contentSize = ((flg >> 3) & 1) == 1
    require(((bd >> 4) & 0x7) >= 4 && (bd & 0x8f) == 0,
      f"lz4: malformed BD byte 0x$bd%02x")
    if (contentSize) bb.position(bb.position() + 8)
    require(bb.remaining >= 1, "lz4: truncated header checksum")
    val hc = bb.get() & 0xff
    // descriptor bytes for the checksum: spec = FLG..(before HC), i.e.
    // from offset 4; kafka 0.9 = magic..(before HC) (KAFKA-3160)
    val specHc = (xxHash32(in, 4, bb.position() - 1 - 4, 0) >> 8) & 0xff
    val kafkaHc = (xxHash32(in, 0, bb.position() - 1, 0) >> 8) & 0xff
    require(hc == specHc || hc == kafkaHc,
      f"lz4: header checksum 0x$hc%02x matches neither the spec value " +
        f"0x$specHc%02x nor kafka-0.9's magic-inclusive value 0x$kafkaHc%02x")
    val bos = new java.io.ByteArrayOutputStream(in.length * 2)
    var done = false
    while (!done) {
      require(bb.remaining >= 4, "lz4: truncated block size")
      val sz = bb.getInt
      if (sz == 0) done = true
      else {
        val stored = (sz & 0x80000000) != 0
        val len = sz & 0x7fffffff
        require(len > 0 && len <= bb.remaining,
          s"lz4: block length $len exceeds remaining ${bb.remaining}")
        val block = new Array[Byte](len)
        bb.get(block)
        if (stored) bos.write(block, 0, len)
        else {
          // frame blocks carry no plaintext size; decode with a growing
          // bound (4 MiB max block size in the format = safe ceiling)
          bos.write(decompressBlockUnsized(block))
        }
      }
    }
    if (contentChecksum && bb.remaining >= 4) bb.getInt // verifiable; skip
    bos.toByteArray
  }

  /** Decode a frame block whose plaintext size is not in the stream:
    * walk the sequences once to compute it, then decode exactly. */
  private def decompressBlockUnsized(in: Array[Byte]): Array[Byte] = {
    var ip = 0
    var outLen = 0L
    def ext(base: Int): Int = {
      var len = base
      if (base == 15) {
        var b = 0
        do {
          require(ip < in.length, "lz4: truncated length extension")
          b = in(ip) & 0xff; ip += 1; len += b
        } while (b == 255)
      }
      len
    }
    var lastLiteralOnly = false
    while (ip < in.length && !lastLiteralOnly) {
      val token = in(ip) & 0xff; ip += 1
      val litLen = ext(token >> 4)
      require(ip + litLen <= in.length, "lz4: literal overruns sizing pass")
      ip += litLen; outLen += litLen
      if (ip == in.length) lastLiteralOnly = true
      else {
        require(ip + 2 <= in.length, "lz4: truncated match offset")
        ip += 2
        outLen += ext(token & 0xf) + 4
      }
    }
    require(outLen <= (4 << 20),
      s"lz4: implausible block plaintext size $outLen")
    decompressBlock(in, outLen.toInt)
  }

  /** Kafka-0.9-shaped frame (FLG: version 1, block-independent; BD:
    * 64 KiB max block; spec-correct header checksum — the decoder
    * accepts both) over all-literal blocks. */
  def compress(in: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(in.length + 32)
    def i32le(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    i32le(Magic)
    val flg = (1 << 6) | (1 << 5) // version 1, block independence
    val bd = 4 << 4               // 64 KiB max block size
    bos.write(flg); bos.write(bd)
    val desc = Array(flg.toByte, bd.toByte)
    bos.write((xxHash32(desc, 0, 2, 0) >> 8) & 0xff)
    val BlockSize = 64 * 1024
    var p = 0
    while (p < in.length) {
      val len = math.min(BlockSize, in.length - p)
      val block = compressBlock(java.util.Arrays.copyOfRange(in, p, p + len))
      i32le(block.length)
      bos.write(block, 0, block.length)
      p += len
    }
    i32le(0) // endmark
    bos.toByteArray
  }

  // ------------------------------------------------------------ xxHash32

  /** xxHash32 from the public spec — only used for the 1-byte frame
    * header checksum. */
  def xxHash32(buf: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    val P1 = -1640531535; val P2 = -2048144777; val P3 = -1028477379
    val P4 = 668265263; val P5 = 374761393
    var idx = off
    val end = off + len
    var h: Int = 0
    if (len >= 16) {
      var v1 = seed + P1 + P2; var v2 = seed + P2
      var v3 = seed; var v4 = seed - P1
      while (idx <= end - 16) {
        def lane(p: Int): Int =
          (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
            ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
        v1 = Integer.rotateLeft(v1 + lane(idx) * P2, 13) * P1
        v2 = Integer.rotateLeft(v2 + lane(idx + 4) * P2, 13) * P1
        v3 = Integer.rotateLeft(v3 + lane(idx + 8) * P2, 13) * P1
        v4 = Integer.rotateLeft(v4 + lane(idx + 12) * P2, 13) * P1
        idx += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P5
    h += len
    while (idx <= end - 4) {
      val lane = (buf(idx) & 0xff) | ((buf(idx + 1) & 0xff) << 8) |
        ((buf(idx + 2) & 0xff) << 16) | ((buf(idx + 3) & 0xff) << 24)
      h = Integer.rotateLeft(h + lane * P3, 17) * P4
      idx += 4
    }
    while (idx < end) {
      h = Integer.rotateLeft(h + (buf(idx) & 0xff) * P5, 11) * P1
      idx += 1
    }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }
}

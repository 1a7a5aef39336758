package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.MediaMjpegVideo

/** The REAL MJPEG-in-AVI codec behind the qa0 seam: the JPEG round-trip
  * of block-uniform quality-1.0 frames must be bit-exact (that exactness
  * is the entire oracle-replayability argument — see mjpegV), unsampled
  * frames must never be entropy-decoded, and malformed containers must
  * fail crisply. No SparkSession — the kernels are plain iterator
  * functions, which is the point of the seam. */
class MjpegCodecSpec extends AnyFunSuite {

  // driver-side replay of the planted block arithmetic (mirrors the oracle)
  private def replay(id: Long) = {
    val nf = (2 + id % 4).toInt
    val w = (5 + id % 10).toInt
    val h = (4 + (id * 5) % 9).toInt
    var (gs, ps, cs, ns) = (0L, 0L, 0L, 0L)
    for (f <- 0 until nf if f % 2 == 0) {
      ns += 1
      cs += (id * 31 + f * 17) % 251
      for (y <- 0 until h; x <- 0 until w) {
        val v = (id * 31 + f * 17 + (x / 8) * 11 + (y / 8) * 7) % 251
        gs += v
        ps += (x + 2L * y) * v
      }
    }
    (nf.toLong, w.toLong, h.toLong, ns, gs, ps, cs)
  }

  private def decode(id: Long, bytes: Array[Byte]) =
    MultimodalQueries.decodeMjpeg(Iterator(MediaMjpegVideo(id, bytes))).next()

  test("MJPEG round-trip is bit-exact across the shape lattice") {
    // ids 0..19 sweep every width 5..14 (1 and 2 block columns), height
    // 4..12 (1 and 2 block rows — including non-multiple-of-8 edge
    // blocks) and every frame count 2..5
    for (id <- 0L until 20L) {
      val got = decode(id, MultimodalQueries.synthesizeMjpegAvi(id))
      val (nf, w, h, ns, gs, ps, cs) = replay(id)
      assert(got.n_frames == nf && got.width == w && got.height == h,
        s"id $id: container dims diverged")
      assert(got.n_sampled == ns, s"id $id: sampled-frame count diverged")
      assert(got.gray_sum == gs,
        s"id $id: gray sum diverged — the JPEG round-trip is not exact")
      assert(got.pos_sum == ps,
        s"id $id: position-weighted sum diverged (frame/row/block order?)")
      assert(got.corner_sum == cs, s"id $id: corner sum diverged")
    }
  }

  /** (dataOffset, size) of the (n+1)-th '00dc' chunk; idx1 entries also
    * hold the fourcc but come after all frames. */
  private def nthFrameChunk(b: Array[Byte], n: Int): (Int, Int) = {
    var found = -1
    var count = 0
    var i = 0
    while (i + 4 <= b.length && found < 0) {
      if (b(i) == '0' && b(i + 1) == '0' && b(i + 2) == 'd' && b(i + 3) == 'c') {
        if (count == n) found = i + 8
        count += 1
      }
      i += 1
    }
    assert(found > 0, s"frame $n not found")
    val sz = (b(found - 4) & 0xFF) | ((b(found - 3) & 0xFF) << 8) |
      ((b(found - 2) & 0xFF) << 16) | ((b(found - 1) & 0xFF) << 24)
    (found, sz)
  }

  /** Offset of the FIRST entropy-coded byte of the frame's scan — right
    * after the SOS segment header. A block-uniform tiny JPEG carries only
    * a few entropy bytes (DC code + EOB), so offsets relative to the
    * frame END can land in huffman-table or padding bytes whose flip is a
    * decode no-op; the first scan byte holds the DC huffman code and a
    * flip there must reach the entropy decoder. */
  private def scanDataOffset(b: Array[Byte], n: Int): Int = {
    val (off, sz) = nthFrameChunk(b, n)
    var i = off
    while (i + 4 < off + sz &&
      !((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA)) i += 1
    assert(i + 4 < off + sz, s"frame $n: no SOS marker found")
    val segLen = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    i + 2 + segLen
  }

  test("unsampled frames are never entropy-decoded: corrupting one is invisible") {
    val id = 3L // nf = 5: frames 1 and 3 unsampled
    val clean = MultimodalQueries.synthesizeMjpegAvi(id)
    val tampered = clean.clone()
    // corrupt unsampled frame 1's entropy-coded scan data — if the
    // decoder ran JPEG decode on it, this would either throw or change
    // pixels; a true seek-past cannot see it
    val off = scanDataOffset(tampered, 1)
    tampered(off) = (tampered(off) ^ 0x5A).toByte
    assert(decode(id, clean) == decode(id, tampered),
      "corrupting an unsampled frame changed the stats — the decoder is " +
        "entropy-decoding frames it claims to skip")
  }

  test("corrupting a SAMPLED frame's JPEG payload is loud, never silent") {
    val id = 3L
    val clean = MultimodalQueries.synthesizeMjpegAvi(id)
    val tampered = clean.clone()
    val off = scanDataOffset(tampered, 2) // frame 2 is sampled
    tampered(off) = (tampered(off) ^ 0x5A).toByte
    // a corrupted JPEG either decodes to different pixels or fails the
    // read — both must be visible (stats differ or exception), because a
    // silently identical result would mean the bytes were never decoded
    val cleanStats = decode(id, clean)
    try assert(decode(id, tampered) != cleanStats)
    catch { case _: IllegalArgumentException | _: javax.imageio.IIOException => () }
  }

  test("truncated payloads fail crisply, naming the document") {
    val full = MultimodalQueries.synthesizeMjpegAvi(7L)
    for (cut <- Seq(4, 11, 60, full.length / 2, full.length - 3)) {
      val e = intercept[IllegalArgumentException] {
        decode(7L, full.take(cut))
      }
      assert(e.getMessage.contains("doc 7"), s"cut=$cut: ${e.getMessage}")
    }
  }

  test("random byte mutations never hang, loop or corrupt silently — decode or crisp error") {
    // the walker reads untrusted bytes at scale: any mutation must end in
    // a bounded amount of work with either a successful decode or a typed
    // exception (IllegalArgumentException from the walker, IIOException /
    // IndexOutOfBounds-wrapped-as-IAE from the JPEG reader) — never an
    // infinite loop (chunk sizes are attacker-controlled) or a silent
    // wrong-shape result
    val rnd = new scala.util.Random(1234)
    val clean = MultimodalQueries.synthesizeMjpegAvi(11L)
    val cleanStats = decode(11L, clean)
    var decoded = 0
    for (trial <- 0 until 200) {
      val b = clean.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val off = rnd.nextInt(b.length)
        b(off) = (b(off) ^ (1 + rnd.nextInt(255))).toByte
      }
      try {
        val st = decode(11L, b)
        decoded += 1
        // a successful decode must still be shape-sane (the walker
        // cross-validates avih/strf/idx1, so dims can't be garbage)
        assert(st.n_frames == cleanStats.n_frames &&
          st.width == cleanStats.width && st.height == cleanStats.height,
          s"trial $trial: decode succeeded with mutated shape: $st")
      } catch {
        case _: IllegalArgumentException => ()       // walker's crisp fail
        case _: javax.imageio.IIOException => ()     // JPEG reader's fail
      }
    }
    // most mutations hit the JPEG payloads (the bulk of the bytes) and
    // many of those still decode (entropy bits changed, pixels differ) —
    // the invariant is bounded termination + typed failure, not rejection
    assert(decoded >= 0) // reached = no hang across 200 mutations
  }

  test("a chunk size that wraps negative fails crisply instead of stalling the walk") {
    // 0xFFFFFFF8 as a chunk size wraps to -8 under .toInt, which under
    // the old advance (p = data + sz + (sz & 1)) moved the scan pointer
    // by exactly 0 — an infinite loop on attacker-controlled bytes
    def withFrameSize(bytes: Array[Byte], v: Long): Array[Byte] = {
      val b = bytes.clone()
      val (off, _) = nthFrameChunk(b, 1)
      b(off - 4) = (v & 0xFF).toByte; b(off - 3) = ((v >> 8) & 0xFF).toByte
      b(off - 2) = ((v >> 16) & 0xFF).toByte; b(off - 1) = ((v >> 24) & 0xFF).toByte
      b
    }
    for (sz <- Seq(0xFFFFFFF8L, 0xFFFFFFFFL, 0x7FFFFFFFL)) {
      val e = intercept[IllegalArgumentException] {
        decode(11L, withFrameSize(MultimodalQueries.synthesizeMjpegAvi(11L), sz))
      }
      assert(e.getMessage.contains("chunk size") || e.getMessage.contains("overruns"),
        s"sz=$sz: ${e.getMessage}")
    }
    // same hazard in the DIB walker
    val dib = MultimodalQueries.synthesizeAvi(7L).clone()
    // first '00db' chunk's size field: find the fourcc, patch 4 bytes after it
    var i = 0
    while (!(dib(i) == '0' && dib(i + 1) == '0' && dib(i + 2) == 'd' && dib(i + 3) == 'b')) i += 1
    dib(i + 4) = 0xF8.toByte; dib(i + 5) = 0xFF.toByte
    dib(i + 6) = 0xFF.toByte; dib(i + 7) = 0xFF.toByte
    val e2 = intercept[IllegalArgumentException] {
      MultimodalQueries.decodeAvi(
        Iterator(MultimodalQueries.MediaAviVideo(7L, dib))).next()
    }
    assert(e2.getMessage.contains("chunk size") || e2.getMessage.contains("overruns"))
  }

  test("an uncompressed-DIB AVI is rejected by the MJPEG decoder, and vice versa") {
    val dib = MultimodalQueries.synthesizeAvi(5L)
    val e = intercept[IllegalArgumentException] { decode(5L, dib) }
    assert(e.getMessage.contains("handler") || e.getMessage.contains("MJPG"),
      e.getMessage)
    val mjpg = MultimodalQueries.synthesizeMjpegAvi(5L)
    val e2 = intercept[IllegalArgumentException] {
      MultimodalQueries.decodeAvi(
        Iterator(MultimodalQueries.MediaAviVideo(5L, mjpg))).next()
    }
    assert(e2.getMessage.contains("handler") || e2.getMessage.contains("DIB"),
      e2.getMessage)
  }
}

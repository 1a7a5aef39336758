package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.MediaAviVideo

/** The REAL uncompressed RIFF/AVI codec behind the q6y seam: bit-exact
  * round-trips across the id-derived shape lattice (every DIB row-padding
  * residue, both frame-count parities), proof that unsampled frames are
  * truly skipped (tampering them is invisible), and crisp failures on
  * truncated or non-AVI payloads. No SparkSession — the kernels are plain
  * iterator functions, which is the point of the seam. */
class AviCodecSpec extends AnyFunSuite {

  // driver-side replay of the synthesis formulas (mirrors the oracle)
  private def replay(id: Long) = {
    val nf = (2 + id % 5).toInt
    val w = (5 + id % 10).toInt
    val h = (4 + (id * 5) % 9).toInt
    var (bs, gs, rs, cs, ns) = (0L, 0L, 0L, 0L, 0L)
    for (f <- 0 until nf if f % 2 == 0) {
      ns += 1
      cs += (id + 11L * f) % 256
      for (y <- 0 until h; x <- 0 until w) {
        bs += (id + 7L * x + 13L * y + 11L * f) % 256
        gs += (5L * id + 11L * x + 3L * y + 17L * f) % 256
        rs += (2L * id + 1L * x * y + 23L * f) % 256
      }
    }
    (nf.toLong, w.toLong, h.toLong, ns, bs, gs, rs, cs)
  }

  private def decode(id: Long, bytes: Array[Byte]) =
    MultimodalQueries.decodeAvi(Iterator(MediaAviVideo(id, bytes))).next()

  test("AVI round-trip is bit-exact across the shape lattice") {
    // ids 0..19 sweep every width residue (all four stride paddings),
    // every frame count 2..6 and every height 4..12
    for (id <- 0L until 20L) {
      val got = decode(id, MultimodalQueries.synthesizeAvi(id))
      val (nf, w, h, ns, bs, gs, rs, cs) = replay(id)
      assert(got.n_frames == nf && got.width == w && got.height == h,
        s"id $id: container dims diverged")
      assert(got.n_sampled == ns, s"id $id: sampled-frame count diverged")
      assert((got.b_sum, got.g_sum, got.r_sum) == ((bs, gs, rs)),
        s"id $id: channel sums diverged (BGR order / stride / row flip?)")
      assert(got.corner_sum == cs,
        s"id $id: corner sum diverged — bottom-up rows not un-flipped?")
    }
  }

  private def nthFrameDataOffset(b: Array[Byte], n: Int): Int = {
    // scan for the (n+1)-th '00db' ckid inside the byte stream (idx1
    // entries also hold the fourcc but come after all frames)
    var found = -1
    var count = 0
    var i = 0
    while (i + 4 <= b.length && found < 0) {
      if (b(i) == '0' && b(i + 1) == '0' && b(i + 2) == 'd' && b(i + 3) == 'b') {
        if (count == n) found = i + 8
        count += 1
      }
      i += 1
    }
    assert(found > 0, s"frame $n not found")
    found
  }

  test("unsampled frames are genuinely skipped: tampering one is invisible") {
    val id = 7L // nf = 4: frames 1 and 3 unsampled
    val clean = MultimodalQueries.synthesizeAvi(id)
    val tampered = clean.clone()
    val off = nthFrameDataOffset(tampered, 1) + 5
    tampered(off) = (tampered(off) ^ 0x5A).toByte
    val a = decode(id, clean)
    val b = decode(id, tampered)
    assert(a == b, "tampering an unsampled frame changed the stats — " +
      "the decoder is reading frames it claims to skip")
  }

  test("tampering a SAMPLED frame does change the stats") {
    val id = 7L
    val clean = MultimodalQueries.synthesizeAvi(id)
    val tampered = clean.clone()
    val off = nthFrameDataOffset(tampered, 2) + 5 // frame 2 is sampled
    tampered(off) = (tampered(off) ^ 0x5A).toByte
    assert(decode(id, clean) != decode(id, tampered))
  }

  test("truncated payloads fail crisply, naming the document") {
    val full = MultimodalQueries.synthesizeAvi(3L)
    for (cut <- Seq(4, 11, 60, full.length / 2, full.length - 3)) {
      val e = intercept[IllegalArgumentException] {
        decode(3L, full.take(cut))
      }
      assert(e.getMessage.contains("doc 3"), s"cut=$cut: ${e.getMessage}")
    }
  }

  test("garbage and non-AVI RIFF payloads fail crisply") {
    val garbage = Array.tabulate[Byte](256)(i => (i * 131).toByte)
    val e1 = intercept[IllegalArgumentException] { decode(9L, garbage) }
    assert(e1.getMessage.contains("doc 9"))
    // a genuine RIFF container of the wrong kind (WAVE) must be rejected
    // as not-AVI, not misparsed
    val wav = MultimodalQueries.synthesizeWav(9L)
    val e2 = intercept[IllegalArgumentException] { decode(9L, wav) }
    assert(e2.getMessage.contains("not a RIFF/AVI container"))
  }

  test("a declared-vs-actual frame-count mismatch is rejected") {
    val b = MultimodalQueries.synthesizeAvi(5L)
    val tampered = b.clone()
    // avih dwTotalFrames lives at RIFF(12) + LIST hdr(12) + ckhdr(8) + 16
    val off = 12 + 12 + 8 + 16
    tampered(off) = (tampered(off) + 1).toByte
    val e = intercept[IllegalArgumentException] { decode(5L, tampered) }
    assert(e.getMessage.contains("declared"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MultimodalQueries
import graft.queries.MultimodalQueries.{MediaAudio, MediaImage, MediaVideo}

/** The REAL media codecs behind the mapPartitions seam (q6h PNG, q6j
  * WAV): lossless round-trips for every deterministic fixture shape, and
  * CRISP failures on corrupt payloads — a truncated blob in a 100 TB
  * corpus must name the document, not NPE three operators later or
  * silently emit garbage stats. No SparkSession — the kernels are plain
  * iterator functions, which is the point of the seam. */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG round-trip is lossless across the id-derived shape space") {
    // ids chosen to cover the width/height modulus lattice extremes
    for (id <- Seq(0L, 1L, 16L, 12L, 220L, 221L)) {
      val stats = MultimodalQueries
        .decodeImages(Iterator(MediaImage(id, MultimodalQueries.synthesizePng(id))))
        .next()
      assert(stats.n_px == stats.width * stats.height)
      assert(stats.width == 8 + id % 17 && stats.height == 8 + (id * 3) % 13)
      // channel sums bounded by 255 * n_px and nonzero for any id
      assert(stats.r_sum > 0 && stats.r_sum <= 255 * stats.n_px)
    }
  }

  test("nearest-neighbor resize replays exactly from the pixel formula") {
    // the resized sums must equal a driver-side replay of the NN source
    // mapping over the known synthesis arithmetic — decode, resize,
    // RE-ENCODE, decode again all have to be lossless for this to hold
    for (id <- Seq(0L, 1L, 16L, 220L)) {
      val got = MultimodalQueries
        .resizeImages(Iterator(MediaImage(id, MultimodalQueries.synthesizePng(id))))
        .next()
      val (w, h) = ((8 + id % 17).toInt, (8 + id * 3 % 13).toInt)
      var (rs, gs, bs) = (0L, 0L, 0L)
      for (y <- 0 until 12; x <- 0 until 16) {
        val (sx, sy) = (x * w / 16, y * h / 12)
        rs += (id + 7L * sx + 13L * sy) % 256
        gs += (5L * id + 11L * sx + 3L * sy) % 256
        bs += (2L * id + sx.toLong * sy) % 256
      }
      assert(got.src_w == w && got.src_h == h, s"id $id: wrong source dims")
      assert((got.r_sum, got.g_sum, got.b_sum) == ((rs, gs, bs)),
        s"id $id: resized sums diverged from the NN replay")
    }
  }

  test("garbage bytes into resize fail crisply, naming the document") {
    val garbage = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    val e = intercept[IllegalArgumentException] {
      MultimodalQueries.resizeImages(Iterator(MediaImage(77L, garbage))).next()
    }
    assert(e.getMessage.contains("77"))
  }

  test("WAV round-trip is lossless for both channel layouts") {
    for (id <- Seq(0L, 1L, 2L, 97L, 196L)) { // even = mono, odd = stereo
      val stats = MultimodalQueries
        .decodeAudio(Iterator(MediaAudio(id, MultimodalQueries.synthesizeWav(id))))
        .next()
      assert(stats.n_frames == 64 + id % 97)
      assert(stats.channels == 1 + id % 2)
      assert(stats.peak <= 32768)
      if (stats.channels == 1) assert(stats.ch1_sum == 0L)
      else assert(stats.ch1_sum != stats.ch0_sum) // interleaving not collapsed
    }
  }

  test("GIF multi-frame round-trip is lossless frame-by-frame across the shape lattice") {
    // ids cover the frame-count modulus (2..5 frames, so both parities of
    // sampled-frame counts) and the width/height lattice extremes
    for (id <- Seq(0L, 1L, 2L, 3L, 8L, 62L, 251L)) {
      val nf = 2 + id % 4
      val (w, h) = (6 + id % 9, 6 + (id * 3) % 7)
      val stats = MultimodalQueries
        .decodeVideo(Iterator(MediaVideo(id, MultimodalQueries.synthesizeGif(id))))
        .next()
      assert(stats.n_frames == nf && stats.width == w && stats.height == h)
      assert(stats.n_sampled == (nf + 1) / 2)
      // replay the exact arithmetic driver-side: only a lossless
      // palette-exact round-trip of EVERY sampled frame can agree
      var (expSum, expPeak) = (0L, 0L)
      for (f <- 0 until nf.toInt by 2; y <- 0 until h.toInt; x <- 0 until w.toInt) {
        val v = (id + 11L * f + 7L * x + 13L * y) % 256
        expSum += v
        if (v > expPeak) expPeak = v
      }
      assert(stats.sampled_sum == expSum, s"id=$id sampled_sum")
      assert(stats.peak == expPeak, s"id=$id peak")
    }
  }

  test("garbage bytes as a GIF fail crisply, naming the document") {
    val e = intercept[Exception] {
      MultimodalQueries.decodeVideo(
        Iterator(MediaVideo(5L, Array.fill[Byte](64)(0x41)))).next()
    }
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[javax.imageio.IIOException] ||
      e.isInstanceOf[java.io.IOException], s"unexpected failure type: $e")
  }

  test("a truncated GIF never fabricates frames beyond the bytes it holds") {
    val good = MultimodalQueries.synthesizeGif(9L) // 3 frames
    val torn = good.take(good.length / 2)
    val res =
      try Some(MultimodalQueries.decodeVideo(Iterator(MediaVideo(9L, torn))).next())
      catch { case _: Exception => None } // a crisp refusal is also fine
    res.foreach { stats =>
      assert(stats.n_frames < 3, s"decoded ${stats.n_frames} frames from a truncated stream")
    }
  }

  test("qd2: disposal compositing replays the closed-form spec across the shape lattice") {
    import MultimodalQueries._
    // driver-side reference: the oracle's closed form (disjoint patch
    // slots — per pixel the winner is a CASE, not a recursion)
    def refStats(id: Long): (Long, Long, Long) = {
      val (w, h, nf) = (animW(id), animH(id), animFrames(id))
      val m = (w / 2) * (h / 2)
      var (cs, corner, pk) = (0L, 0L, 0L)
      for (f <- 0 until nf by 2; y <- 0 until h; x <- 0 until w) {
        val (cx, cy) = (x / 2, y / 2)
        val k0 = if (cx < w / 2 && cy < h / 2)
          (((cx + cy * (w / 2) - id) % m + m) % m).toInt else -1
        val v0 = animBasePx(id, x, y)
        val v = if (k0 < 1 || k0 > nf - 1 || k0 > f) v0
          else if (k0 == f || animDisposal(id, k0) == 0) animPatchPx(id, k0, x, y)
          else if (animDisposal(id, k0) == 1) 0
          else v0
        cs += v; if (x == 0 && y == 0) corner += v
        if (v > pk) pk = v
      }
      (cs, corner, pk)
    }
    // ids covering every (nf mod, disposal-phase, w/h) combination class
    for (id <- 0L to 23L) {
      val s = decodeAnimComposited(
        Iterator(MediaVideo(id, synthesizeAnimGif(id)))).next()
      val (cs, corner, pk) = refStats(id)
      assert((s.composed_sum, s.corner_sum, s.peak) == (cs, corner, pk),
        s"id=$id: composited stats diverge from the closed form")
      assert(s.n_frames == animFrames(id) && s.n_sampled == (animFrames(id) + 1) / 2)
    }
  }

  test("qd2: a decode-only-sampled-frames shortcut CANNOT reproduce the composited stats") {
    import MultimodalQueries._
    // the naive shortcut every full-repaint decoder (q6m) gets away
    // with: paint ONLY the sampled frames' patches, skip odd frames
    def shortcutSum(id: Long): Long = {
      val gif = synthesizeAnimGif(id)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      try {
        reader.setInput(iis, false)
        val nf = reader.getNumImages(true)
        val first = reader.read(0)
        val (w, h) = (first.getWidth, first.getHeight)
        val canvas = new Array[Int](w * h)
        var cs = 0L
        for (f <- 0 until nf by 2) { // SKIPS the odd frames entirely
          val img = reader.read(f)
          val md = reader.getImageMetadata(f)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val d = md.getElementsByTagName("ImageDescriptor").item(0)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val (l, t) = (d.getAttribute("imageLeftPosition").toInt,
            d.getAttribute("imageTopPosition").toInt)
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            canvas((t + y) * w + (l + x)) = img.getRGB(x, y) & 0xFF
          cs += canvas.map(_.toLong).sum
        }
        cs
      } finally { reader.dispose(); iis.close() }
    }
    val diverged = (0L to 23L).count { id =>
      val full = decodeAnimComposited(
        Iterator(MediaVideo(id, synthesizeAnimGif(id)))).next().composed_sum
      shortcutSum(id) != full
    }
    assert(diverged >= 12,
      s"only $diverged/24 ids diverged — the fixtures no longer force " +
        "cross-frame composition")
  }

  test("qd2: garbage bytes fail crisply; a truncated stream never fabricates frames") {
    import MultimodalQueries._
    val e = intercept[Exception] {
      decodeAnimComposited(
        Iterator(MediaVideo(7L, Array.fill[Byte](64)(0x41)))).next()
    }
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[javax.imageio.IIOException] ||
      e.isInstanceOf[java.io.IOException], s"unexpected failure type: $e")
    val good = synthesizeAnimGif(3L) // 7 frames
    val torn = good.take(good.length / 2)
    val res = try Some(decodeAnimComposited(
        Iterator(MediaVideo(3L, torn))).next())
      catch { case _: Exception => None } // a crisp refusal is also fine
    res.foreach(stats => assert(stats.n_frames < animFrames(3L),
      s"decoded ${stats.n_frames} frames from a truncated stream"))
  }

  test("a truncated PNG fails crisply, naming the document") {
    val good = MultimodalQueries.synthesizePng(7L)
    val torn = good.take(good.length / 2)
    val e = intercept[Exception] {
      MultimodalQueries.decodeImages(Iterator(MediaImage(7L, torn))).next()
    }
    // either ImageIO throws on the truncated zlib stream or returns null
    // and the seam's require names the doc — both are crisp, neither is
    // silent garbage; the doc id must be recoverable from at least the
    // require path
    assert(e.isInstanceOf[IllegalArgumentException] ||
      e.isInstanceOf[javax.imageio.IIOException] ||
      e.isInstanceOf[java.io.IOException] ||
      e.isInstanceOf[java.io.EOFException],
      s"unexpected failure type: $e")
  }

  test("garbage bytes as a PNG fail crisply, naming the document") {
    val e = intercept[IllegalArgumentException] {
      MultimodalQueries.decodeImages(
        Iterator(MediaImage(9L, Array.fill[Byte](64)(0x41)))).next()
    }
    assert(e.getMessage.contains("doc 9"), e.getMessage)
  }

  test("garbage bytes as a WAV fail crisply (unsupported container)") {
    val e = intercept[Exception] {
      MultimodalQueries.decodeAudio(
        Iterator(MediaAudio(3L, Array.fill[Byte](64)(0x41)))).next()
    }
    assert(e.isInstanceOf[javax.sound.sampled.UnsupportedAudioFileException] ||
      e.isInstanceOf[java.io.IOException], s"unexpected failure type: $e")
  }

  test("a truncated WAV yields only the frames its data chunk holds, never garbage beyond") {
    // RIFF readers tolerate a short final chunk; the decode must bound
    // itself by the actual bytes, not the header's promise
    val good = MultimodalQueries.synthesizeWav(4L) // mono, 68 frames
    val torn = good.take(good.length - 40) // drop 20 frames' worth
    val res =
      try Some(MultimodalQueries.decodeAudio(Iterator(MediaAudio(4L, torn))).next())
      catch { case _: Exception => None } // a crisp refusal is also fine
    res.foreach { stats =>
      assert(stats.n_frames < 68, s"decoded ${stats.n_frames} frames from a truncated clip")
    }
  }
}

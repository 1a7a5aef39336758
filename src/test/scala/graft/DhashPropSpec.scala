package graft

import graft.queries.MultimodalQueries.{dhashImages, MediaImage}

/** Property contract for the perceptual dHash seam (q9t/q8o): on RANDOM
  * images (not the oracle's formula-generated fixtures) the
  * decode→9×8-NN-sample→gradient-bits pipeline must equal a driver-side
  * reference that computes the same hash straight from the pixel array —
  * certifying the PNG encode→decode round trip inside the seam with
  * pixels no formula can predict. Plus the perceptual invariance that
  * justifies calling it a perceptual hash: a uniform brightness shift
  * that clips nothing leaves every gradient sign — and the hash —
  * unchanged.
  */
class DhashPropSpec extends SparkSpec {

  private def png(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def referenceHash(px: Array[Array[Int]]): (Long, Long) = {
    val h = px.length; val w = px(0).length
    def gray(x: Int, y: Int): Int = {
      val rgb = px(y * h / 8)(x * w / 9)
      (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
    }
    var h0 = 0L; var h1 = 0L
    for (k <- 0 until 64) {
      val x = k % 8; val y = k / 8
      if (gray(x + 1, y) > gray(x, y)) {
        if (k < 32) h0 |= 1L << k else h1 |= 1L << (k - 32)
      }
    }
    (h0, h1)
  }

  test("property: seam hash == pixel-array reference on 40 random images") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 40) {
      val w = 9 + rnd.nextInt(30); val h = 8 + rnd.nextInt(30)
      val px = Array.fill(h, w)(rnd.nextInt(0x1000000))
      val got = dhashImages(Iterator(MediaImage(trial.toLong, png(px)))).next()
      val (h0, h1) = referenceHash(px)
      assert((got.h0, got.h1) === ((h0, h1)), s"trial $trial ${w}x$h")
      // band split is pure bit algebra over the halves
      assert(got.b0 === (h0 & 0xFFFF).toInt && got.b1 === ((h0 >> 16) & 0xFFFF).toInt)
      assert(got.b2 === (h1 & 0xFFFF).toInt && got.b3 === ((h1 >> 16) & 0xFFFF).toInt)
    }
  }

  test("perceptual invariance: a non-clipping uniform brightness shift preserves the hash") {
    val rnd = new scala.util.Random(7L)
    // channels in [64, 191] so a +-32 shift never clips
    def c() = 64 + rnd.nextInt(128)
    val px = Array.fill(16, 20)((c() << 16) | (c() << 8) | c())
    def shifted(d: Int) = px.map(_.map { rgb =>
      ((((rgb >> 16) & 0xFF) + d) << 16) |
        ((((rgb >> 8) & 0xFF) + d) << 8) | ((rgb & 0xFF) + d)
    })
    val base = dhashImages(Iterator(MediaImage(1L, png(px)))).next()
    for (d <- Seq(-32, -5, 5, 32)) {
      val got = dhashImages(Iterator(MediaImage(2L, png(shifted(d))))).next()
      assert((got.h0, got.h1) === ((base.h0, base.h1)), s"shift $d changed the hash")
    }
  }
}

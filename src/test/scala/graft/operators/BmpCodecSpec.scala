package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The mm5 BMP path: synthesis/parse round-trip in image order (which
  * proves the bottom-up flip is applied), top-down files also decode,
  * stride padding at non-multiple-of-4 widths is honored, and
  * malformed inputs degrade to None.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def payload(seed: Int, n: Int = 16): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 37 + i * 11) % 256).toByte)

  test("synthesized BMP parses back to source grays in image order") {
    for (seed <- 0 until 50) {
      val p = payload(seed)
      val parsed = Multimodal.parseBmp(Multimodal.bmpBytes(p))
      assert(parsed.isDefined, s"seed $seed failed to parse")
      val (w, h, lum) = parsed.get
      assert(w == 4 && h == 4)
      assert(lum.toSeq == p.map(_ & 0xFF).toSeq, s"seed $seed pixel order")
    }
  }

  test("top-down BMP (negative height) also decodes correctly") {
    val p = payload(3)
    val b = Multimodal.bmpBytes(p)
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4) // negative height = top-down storage
    // stored rows were written for bottom-up; reinterpreting as
    // top-down must yield the vertically flipped image
    val (w, h, lum) = Multimodal.parseBmp(b).get
    assert(w == 4 && h == 4)
    val flipped = (0 until 4).flatMap(y => (0 until 4).map(x => p((3 - y) * 4 + x) & 0xFF))
    assert(lum.toSeq == flipped)
  }

  test("non-multiple-of-4 width exercises stride padding") {
    val p = payload(7, 15) // 5x3
    val parsed = Multimodal.parseBmp(Multimodal.bmpBytes(p, w = 5, h = 3))
    assert(parsed.isDefined)
    val (w, h, lum) = parsed.get
    assert(w == 5 && h == 3)
    assert(lum.toSeq == p.map(_ & 0xFF).toSeq)
  }

  test("malformed inputs return None, never throw") {
    val good = Multimodal.bmpBytes(payload(9))
    def patched(at: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(at, v)
      b
    }
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte]('B', 'M'),
      good.take(30),            // truncated header
      good.take(60),            // truncated pixel data
      "XX".getBytes("US-ASCII") ++ good.drop(2), // bad magic
      patched(14, 108),         // BITMAPV4 header (unsupported)
      patched(30, 1),           // RLE compression (unsupported)
      patched(10, good.length)  // pixel offset past EOF
    )
    cases.zipWithIndex.foreach { case (c, i) =>
      val r = try Multimodal.parseBmp(c)
      catch { case e: Throwable => fail(s"case $i threw ${e.getClass}") }
      assert(r.isEmpty, s"case $i parsed but should be rejected")
    }
  }

  test("dHash bit layout: row-major MSB-first gradient signs") {
    // 2x2 image: one comparison per row → 2 bits.
    // row 0: 10 < 20 → 1 (MSB); row 1: 30 < 25 → 0
    assert(Multimodal.dHashBits(2, 2, Array(10, 20, 30, 25)) === 2L)
    // flat image hashes to 0 (strict <)
    assert(Multimodal.dHashBits(4, 4, Array.fill(16)(7)) === 0L)
    // identical pixels → identical hash; flipping one gradient flips
    // exactly that bit
    val px = Array.tabulate(16)(i => (i * 37 + 11) % 256)
    val h1 = Multimodal.dHashBits(4, 4, px)
    assert(h1 === Multimodal.dHashBits(4, 4, px.clone()))
    val px2 = px.clone(); px2(0) = 255 // pair k=0 is the MSB (bit 11)
    val h2 = Multimodal.dHashBits(4, 4, px2)
    val expectFlip = (px(0) < px(1)) != (px2(0) < px2(1))
    assert(((h1 ^ h2) == (if (expectFlip) 1L << 11 else 0L)))
  }

  test("dHash through the PNG codec equals dHash on the source grays") {
    val p = payload(9)
    val (w, h, lum) = Multimodal.parsePng(Multimodal.pngBytes(p)).get
    assert(Multimodal.dHashBits(w, h, lum) ===
      Multimodal.dHashBits(4, 4, p.map(_ & 0xFF)))
  }

  test("dHash rejects widths whose bit count exceeds 64") {
    intercept[IllegalArgumentException] {
      Multimodal.dHashBits(10, 8, Array.fill(80)(0))
    }
  }

  test("mm12 transcode kernel: BMP -> PNG -> pixels is lossless on " +
       "random images, including sizes far beyond one deflate call") {
    val rnd = new scala.util.Random(11)
    // (w, h) cases: the gate's 4x4, odd strides, and a 64x48 image
    // whose compressed stream exceeds the old single-deflate buffer
    // assumption (the r10 advisory's drain-loop fix stays covered)
    for ((w, h) <- Seq((4, 4), (5, 3), (7, 9), (64, 48))) {
      val p = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val viaBmp = Multimodal.parseBmp(Multimodal.bmpBytes(p, w, h)).get
      assert(viaBmp._1 == w && viaBmp._2 == h)
      val png = Multimodal.pngBytes(viaBmp._3.map(_.toByte), w, h)
      val (w2, h2, lum2) = Multimodal.parsePng(png).get
      assert(w2 == w && h2 == h, s"$w x $h dims")
      assert(lum2.toSeq == p.map(_ & 0xFF).toSeq, s"$w x $h pixels")
    }
  }
}

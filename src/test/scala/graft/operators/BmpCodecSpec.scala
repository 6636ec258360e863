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
}

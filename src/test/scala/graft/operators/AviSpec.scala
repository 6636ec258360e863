package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** mm13 container contracts: the AVI/MJPEG writer+walker pair, both
  * directions against the JDK's INDEPENDENT ImageIO JPEG codec (the
  * JpegSpec methodology lifted to the container level):
  *  - my aviBytes wrapping MY encoder's frames walks + decodes exact;
  *  - my walker + decoder over a committed fixture whose frames were
  *    encoded ONCE by ImageIO (bytes on disk, JDK-drift-proof);
  *  - frames are opaque to the walk (odd-length chunk padding, 00db);
  *  - malformed containers return None, never throw.
  */
class AviSpec extends AnyFunSuite {

  private def framePayload(f: Int): Array[Byte] =
    Array.tabulate[Byte](16)(i => (16 * f + i).toByte)

  private def flat(f: Int): Array[Int] =
    Multimodal.blockUpscale(framePayload(f), 4, 4)

  private def assertExact(lum: Array[Int], f: Int): Unit = {
    val want = flat(f)
    assert(lum.length === want.length)
    assert(lum.sameElements(want), s"frame $f decoded pixels drifted")
  }

  test("aviBytes(my encoder frames) → parseAvi → Jpeg.decode is exact " +
       "per frame, with declared count/geometry matching") {
    val frames = (0 until 3).map(f => Jpeg.encodeGray(flat(f), 32, 32))
    val avi = Multimodal.aviBytes(frames, 32, 32)
    val Some((w, h, declared, got)) = Multimodal.parseAvi(avi)
    assert((w, h, declared) === ((32, 32, 3)))
    assert(got.length === 3)
    got.zipWithIndex.foreach { case (jb, f) =>
      assert(jb.sameElements(frames(f)), s"frame $f bytes not verbatim")
      val Some((jw, jh, lum)) = Jpeg.decode(jb)
      assert((jw, jh) === ((32, 32)))
      assertExact(lum, f)
    }
  }

  test("committed fixture (frames independently encoded by ImageIO, " +
       "bytes on disk) walks and decodes to the payloads per flat block") {
    val url = getClass.getResource("/fixtures/media/doc_0000000000.avi")
    assert(url != null, "committed AVI fixture missing — run " +
      "Test/runMain graft.operators.GenAviFixture")
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(url.toURI))
    val Some((w, h, declared, frames)) = Multimodal.parseAvi(disk)
    assert((w, h, declared, frames.length) === ((32, 32, 3, 3)))
    frames.zipWithIndex.foreach { case (jb, f) =>
      val Some((jw, jh, lum)) = Jpeg.decode(jb)
      assert((jw, jh) === ((32, 32)))
      assertExact(lum, f)
    }
  }

  test("frame chunks are opaque to the walk: odd-length payloads (pad " +
       "byte) and 00db ids pass through verbatim") {
    val odd = Array.tabulate[Byte](33)(i => (i * 7).toByte)
    val even = Array.tabulate[Byte](20)(i => (i * 3).toByte)
    val avi = Multimodal.aviBytes(Seq(odd, even), 8, 8)
    val Some((_, _, _, got)) = Multimodal.parseAvi(avi)
    assert(got.length === 2)
    assert(got(0).sameElements(odd) && got(1).sameElements(even))
    // 00db (uncompressed-DIB id, same walk arm) also collected
    val db = avi.clone()
    val pos = { // first 00dc tag inside movi
      val s = db.indexOfSlice("movi".getBytes("US-ASCII"))
      db.indexOfSlice("00dc".getBytes("US-ASCII"), s)
    }
    db(pos + 3) = 'b'.toByte
    val Some((_, _, _, got2)) = Multimodal.parseAvi(db)
    assert(got2.length === 2 && got2(0).sameElements(odd))
  }

  test("malformed input returns None, never throws") {
    val good = Multimodal.aviBytes(
      Seq(Jpeg.encodeGray(flat(0), 32, 32)), 32, 32)
    assert(Multimodal.parseAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // truncated mid-movi: the declared-size read runs past the buffer
    assert(Multimodal.parseAvi(good.take(good.length / 2)).isEmpty ||
      Multimodal.parseAvi(good.take(good.length / 2)).exists(_._4.isEmpty))
    // a RIFF/AVI with no avih (unknown header layout) → None
    val noHdr = Multimodal.aviBytes(Seq(), 8, 8)
    val gut = noHdr.clone()
    val avihAt = gut.indexOfSlice("avih".getBytes("US-ASCII"))
    "JUNK".getBytes("US-ASCII").copyToArray(gut, avihAt)
    assert(Multimodal.parseAvi(gut).isEmpty)
  }

  test("a corrupt chunk size near Int.MaxValue is skipped, not " +
       "allocated: bounds arithmetic must not overflow Int (r13 ADVICE)") {
    // valid container, then smash one frame chunk's declared size to
    // 0x7FFFFFF0: pos + sz overflows Int, so a 32-bit `<= end` guard
    // would pass and attempt a ~2 GB allocation; the long-arithmetic
    // guard must skip the chunk and keep the header fields instead
    val frames = (0 until 2).map(f => Jpeg.encodeGray(flat(f), 32, 32))
    val avi = Multimodal.aviBytes(frames, 32, 32)
    val gut = avi.clone()
    val dcAt = gut.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(dcAt > 0)
    val bb = java.nio.ByteBuffer.wrap(gut)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(dcAt + 4, 0x7FFFFFF0)
    val res = Multimodal.parseAvi(gut)
    // never throws/OOMs; header survives, the corrupt frame is dropped
    assert(res.isDefined)
    val Some((w, h, declared, got)) = res
    assert((w, h, declared) === ((32, 32, 2)))
    assert(got.length < 2)
  }

  test("the media lake materializes parseable .avi files whose frames " +
       "decode 32x32") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    val lake = new java.io.File(
      Multimodal.ensureMediaDir(spark, "/root/testdata/sf0.001"))
    val avis = lake.listFiles().filter(_.getName.endsWith(".avi"))
    assert(avis.nonEmpty)
    val bytes = java.nio.file.Files.readAllBytes(avis.head.toPath)
    val Some((w, h, n, frames)) = Multimodal.parseAvi(bytes)
    assert((w, h, n) === ((32, 32, Multimodal.AviFrames)))
    assert(frames.length === n)
    assert(frames.forall(jb =>
      Jpeg.decode(jb).exists { case (jw, jh, _) => jw == 32 && jh == 32 }))
  }
}

/** One-shot generator for the committed AVI fixture: THREE frames
  * (flat-block payloads 0..15, 16..31, 32..47) encoded by the JDK's
  * independent ImageIO codec (quality 1.0 — exact on flat blocks, the
  * JpegSpec-pinned property), wrapped by aviBytes, written to
  * src/test/resources/fixtures/media/doc_0000000000.avi. Run
  * manually; the committed bytes then stay fixed regardless of JDK
  * version drift. */
object GenAviFixture {
  def main(args: Array[String]): Unit = {
    def imageIoJpeg(flat: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = flat(y * 32 + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      baos.toByteArray
    }
    val frames = (0 until 3).map { f =>
      imageIoJpeg(Multimodal.blockUpscale(
        Array.tabulate[Byte](16)(i => (16 * f + i).toByte), 4, 4))
    }
    val out = new java.io.File(
      "src/test/resources/fixtures/media/doc_0000000000.avi")
    java.nio.file.Files.write(out.toPath,
      Multimodal.aviBytes(frames, 32, 32))
    println(s"wrote ${out.getAbsolutePath} (${out.length()} bytes)")
  }
}

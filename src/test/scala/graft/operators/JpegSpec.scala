package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The JPEG codec's independence pins. JPEG decode is not bit-exact
  * across decoders in general (T.81 only bounds IDCT error), so the
  * pinning strategy has two tiers:
  *
  *  - FLAT-BLOCK corpora (the mm7 gate construction): every 8×8 block
  *    is one constant value, so the spectrum is DC-only and — with
  *    all-ones quant tables — EVERY conformant codec round-trips the
  *    pixels exactly. Here the specs demand EXACT equality across the
  *    codec boundary in BOTH directions: bytes from [[Jpeg.encodeGray]]
  *    decoded by the JDK's ImageIO (an independent implementation,
  *    libjpeg-derived), and bytes from ImageIO (quality 1.0) decoded
  *    by [[Jpeg.decode]]. A committed fixture (doc_0000000000.jpg,
  *    written ONCE by ImageIO — `Test/runMain graft.operators
  *    .GenJpegFixture`) pins the decoder to on-disk ground truth that
  *    exists independently of this JVM.
  *
  *  - ARBITRARY pixel corpora: lossy, so the specs demand my decode ≈
  *    the independent decode of the SAME bytes within ±2/sample
  *    (IDCT rounding differences), over streams that exercise the AC
  *    run/size paths, ZRL, nonzero quant tables, restart markers,
  *    4:4:4, and the 1-component grayscale layout.
  */
class JpegSpec extends AnyFunSuite {

  private def imageIoEncode(pixels: Array[Int], w: Int, h: Int,
                            quality: Float, gray: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pixels(y * w + x)
      if (gray) img.getRaster.setSample(x, y, 0, v)
      else img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  /** Independent decode → same luminance convention as Jpeg.decode. */
  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected the stream")
    val w = img.getWidth; val h = img.getHeight
    val lum = Array.tabulate(w * h) { i =>
      val rgb = img.getRGB(i % w, i / w)
      (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
    }
    (w, h, lum)
  }

  private val payload = Array.tabulate[Byte](16)(_.toByte)
  private def flat: Array[Int] = Multimodal.blockUpscale(payload, 4, 4)

  private def assertExact(lum: Array[Int], w: Int, h: Int): Unit = {
    assert((w, h) === ((32, 32)))
    assert(lum.toSeq === flat.toSeq)
  }

  private def maxDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("flat-block corpus: my encoder → my decoder, exact") {
    val Some((w, h, lum)) = Jpeg.decode(Jpeg.encodeGray(flat, 32, 32))
    assertExact(lum, w, h)
  }

  test("flat-block corpus: my encoder → the JDK's INDEPENDENT ImageIO " +
       "decoder, exact (my bitstream is valid T.81 to another codec)") {
    val (w, h, lum) = imageIoDecode(Jpeg.encodeGray(flat, 32, 32))
    assertExact(lum, w, h)
  }

  test("flat-block corpus: ImageIO quality-1.0 encoder → my decoder, " +
       "exact (my decoder handles another codec's bitstream)") {
    val Some((w, h, lum)) = Jpeg.decode(imageIoEncode(flat, 32, 32, 1.0f, gray = false))
    assertExact(lum, w, h)
  }

  test("flat-block corpus through 4:4:4 and restart-interval variants, " +
       "exact in both codecs") {
    for (bytes <- Seq(
        Jpeg.encodeGray(flat, 32, 32, subsample420 = false),
        Jpeg.encodeGray(flat, 32, 32, restartInterval = 1),
        Jpeg.encodeGray(flat, 32, 32, subsample420 = false, restartInterval = 3))) {
      val Some((w, h, mine)) = Jpeg.decode(bytes)
      assertExact(mine, w, h)
      val (_, _, theirs) = imageIoDecode(bytes)
      assertExact(theirs, w, h)
    }
  }

  test("1-component grayscale JPEG (ImageIO TYPE_BYTE_GRAY, q=1.0) → " +
       "my decoder, exact on the flat-block corpus") {
    val Some((w, h, lum)) = Jpeg.decode(imageIoEncode(flat, 32, 32, 1.0f, gray = true))
    assertExact(lum, w, h)
  }

  test("arbitrary pixels, quant=1: my codec round-trips within ±2 and " +
       "agrees with ImageIO's decode of MY bytes within ±2 (dense AC)") {
    val rnd = new scala.util.Random(42)
    val px = Array.fill(48 * 40)(rnd.nextInt(256))
    val bytes = Jpeg.encodeGray(px, 48, 40)
    val Some((w, h, mine)) = Jpeg.decode(bytes)
    assert((w, h) === ((48, 40)))
    assert(maxDiff(mine, px) <= 2, "round-trip drift beyond IDCT rounding")
    val (_, _, theirs) = imageIoDecode(bytes)
    assert(maxDiff(mine, theirs) <= 2, "decoders diverged on my bitstream")
  }

  test("coarse quant table (sparse spectrum → ZRL + long runs): my " +
       "decode of my bytes tracks the independent decode within ±2") {
    val rnd = new scala.util.Random(7)
    // smooth ramp + noise: quant 48 zeroes most ACs, leaving isolated
    // high-zigzag survivors — the ZRL encode/decode path
    val px = Array.tabulate(64 * 64) { i =>
      val x = i % 64; val y = i / 64
      math.min(255, (x * 2 + y) / 2 + rnd.nextInt(90))
    }
    val bytes = Jpeg.encodeGray(px, 64, 64, quant = Array.fill(64)(48))
    val Some((_, _, mine)) = Jpeg.decode(bytes)
    val (_, _, theirs) = imageIoDecode(bytes)
    assert(maxDiff(mine, theirs) <= 2)
  }

  test("ImageIO default-quality bytes (real libjpeg quant + huffman " +
       "output) → my decoder, within ±2 of the independent decode") {
    val rnd = new scala.util.Random(11)
    val px = Array.tabulate(32 * 32) { i =>
      128 + (96 * math.sin(i / 17.0)).toInt + rnd.nextInt(32) - 16
    }.map(v => math.max(0, math.min(255, v)))
    val bytes = imageIoEncode(px, 32, 32, 0.75f, gray = false)
    val Some((w, h, mine)) = Jpeg.decode(bytes)
    assert((w, h) === ((32, 32)))
    val (_, _, theirs) = imageIoDecode(bytes)
    assert(maxDiff(mine, theirs) <= 2)
  }

  test("committed fixture (independently encoded by ImageIO, bytes on " +
       "disk) decodes to the payload per flat block") {
    val url = getClass.getResource("/fixtures/media/doc_0000000000.jpg")
    assert(url != null, "committed JPEG fixture missing")
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(url.toURI))
    val Some((w, h, lum)) = Jpeg.decode(disk)
    assertExact(lum, w, h)
  }

  test("malformed / unsupported input returns None, never throws") {
    val good = Jpeg.encodeGray(flat, 32, 32)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty)
    assert(Jpeg.decode(good.drop(2)).isEmpty)
    // flip SOF0 (C0) to SOF2 (progressive): explicit unsupported-mode None
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xFF) == 0xFF && i + 1 < prog.length &&
        (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("the media lake materializes parseable .jpg files") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    val lake = new java.io.File(
      Multimodal.ensureMediaDir(spark, "/root/testdata/sf0.001"))
    val jpgs = lake.listFiles().filter(_.getName.endsWith(".jpg"))
    assert(jpgs.nonEmpty)
    val bytes = java.nio.file.Files.readAllBytes(jpgs.head.toPath)
    assert(Jpeg.decode(bytes).exists { case (w, h, _) => w == 32 && h == 32 })
  }
}

/** One-shot generator for the committed fixture: the INDEPENDENT
  * encoder's bytes (ImageIO, quality 1.0, flat-block payload 0..15)
  * written to src/test/resources/fixtures/media/doc_0000000000.jpg.
  * Run manually; the committed bytes then stay fixed regardless of
  * JDK version drift. */
object GenJpegFixture {
  def main(args: Array[String]): Unit = {
    val payload = Array.tabulate[Byte](16)(_.toByte)
    val flat = Multimodal.blockUpscale(payload, 4, 4)
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = flat(y * 32 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val out = new java.io.File(
      "src/test/resources/fixtures/media/doc_0000000000.jpg")
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    println(s"wrote ${out.getAbsolutePath} (${out.length()} bytes)")
  }
}

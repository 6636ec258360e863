package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COMMITTED media fixtures (src/test/resources/fixtures/media): a
  * real playable WAV and a real 24-bit BMP checked into the repo, read
  * through the SAME production path the mm4/mm5 gates use (binaryFile
  * source → container parse) — so the file-source plumbing is
  * exercised against bytes that exist independently of this JVM, and
  * the synthesis helpers are pinned byte-for-byte to on-disk ground
  * truth (a format regression in either writer or parser fails here
  * by name). Fixture payload = bytes 0..15. */
class FixtureMediaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fixtureDir = {
    val url = getClass.getResource("/fixtures/media")
    assert(url != null, "committed fixtures missing")
    new java.io.File(url.toURI).getAbsolutePath
  }
  private val payload = Array.tabulate[Byte](16)(_.toByte)

  test("committed WAV is byte-identical to the synthesizer and decodes " +
       "through the binaryFile source") {
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtureDir, "doc_0000000000.wav"))
    assert(disk.sameElements(Multimodal.wavBytes(payload)),
      "wavBytes drifted from the committed container bytes")
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav").load(fixtureDir)
      .select(col("content")).collect()
    assert(rows.length === 1)
    val Some((rate, smp)) = Multimodal.parseWav(rows.head.getAs[Array[Byte]](0))
    assert(rate === 16000)
    val expected = (0 until 8).map(i =>
      (((payload(2 * i) & 0xFF) << 8) | (payload(2 * i + 1) & 0xFF)) - 32768)
    assert(smp.map(_.toInt).toSeq === expected)
  }

  test("committed BMP is byte-identical to the synthesizer and decodes " +
       "to the payload in image order") {
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtureDir, "doc_0000000000.bmp"))
    assert(disk.sameElements(Multimodal.bmpBytes(payload)),
      "bmpBytes drifted from the committed container bytes")
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp").load(fixtureDir)
      .select(col("content")).collect()
    assert(rows.length === 1)
    val Some((w, h, lum)) = Multimodal.parseBmp(rows.head.getAs[Array[Byte]](0))
    assert((w, h) === ((4, 4)))
    // grayscale BGR of byte i at flat index i — the bottom-up flip and
    // stride walk must reconstruct image order exactly
    assert(lum.toSeq === (0 until 16))
  }

  test("committed PNG (independently encoded: CPython zlib, cycled row " +
       "filters) decodes to the payload in image order") {
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtureDir, "doc_0000000000.png"))
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(fixtureDir)
      .select(col("content")).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Array[Byte]](0).sameElements(disk))
    val Some((w, h, lum)) = Multimodal.parsePng(disk)
    assert((w, h) === ((4, 4)))
    assert(lum.toSeq === (0 until 16))
  }

  test("PNG round trip: the JVM encoder's cycled filters (incl. Paeth " +
       "on a 5-row image) invert exactly; corrupt streams return None") {
    val p25 = Array.tabulate[Byte](25)(i => ((i * 37 + 11) % 256).toByte)
    val Some((w, h, lum)) = Multimodal.parsePng(Multimodal.pngBytes(p25, 5, 5))
    assert((w, h) === ((5, 5)))
    assert(lum.toSeq === p25.map(_ & 0xFF).toSeq)
    // corruption paths: magic, truncated IDAT, bad CRC region is
    // ancillary (CRCs are not re-verified — chunk bounds are)
    val good = Multimodal.pngBytes(p25, 5, 5)
    assert(Multimodal.parsePng(good.drop(1)).isEmpty)
    assert(Multimodal.parsePng(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.parsePng(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("mm1's batch decode over the COMMITTED fixture image yields the " +
       "exact pixel features (byte-pinned real-codec contract)") {
    val disk = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixtureDir, "doc_0000000000.bmp"))
    val feats = Multimodal.decodeBatch(Iterator(
      Multimodal.MediaRow(7L, disk, 4, 4, 1))).toSeq
    // payload 0..15 in image order: moment = Σ i·i = 15·16·31/6 = 1240
    assert(feats === Seq(Multimodal.MediaFeatures(7L, 16, 7.5, 15, 0, 1240L)))
    // an undecodable payload is dropped, not thrown
    assert(Multimodal.decodeBatch(Iterator(
      Multimodal.MediaRow(8L, Array[Byte](1, 2, 3), 0, 0, 0))).isEmpty)
  }

  test("the media-lake gate path produces files the fixtures' shape") {
    val dir = "/root/testdata/sf0.001"
    val lake = new java.io.File(Multimodal.ensureMediaDir(spark, dir))
    val wavs = lake.listFiles().filter(_.getName.endsWith(".wav"))
    val bmps = lake.listFiles().filter(_.getName.endsWith(".bmp"))
    assert(wavs.nonEmpty && wavs.length === bmps.length)
    // every materialized file parses through the same production parsers
    val wav = java.nio.file.Files.readAllBytes(wavs.head.toPath)
    val bmp = java.nio.file.Files.readAllBytes(bmps.head.toPath)
    assert(Multimodal.parseWav(wav).exists(_._2.length === 8))
    assert(Multimodal.parseBmp(bmp).exists(_._3.length === 16))
  }

  test("imageDupPairs over a synthesized duplicate lake: exactly the " +
       "byte-identical pairs, dHash collisions verified away") {
    import spark.implicits._
    // payloads: a appears 3x (docs 1,2,5), b twice (3,7), c once (9);
    // d is crafted to share a's GRADIENT SIGNS (same dHash bucket)
    // with different pixel values — a candidate that must verify away
    val a = Array.tabulate(16)(i => (i * 7 + 3) % 251)
    val b = Array.tabulate(16)(i => (200 - i * 9 + 256) % 256)
    val c = Array.fill(16)(128)
    val d = a.map(v => math.min(250, v + 2)) // monotone shift keeps signs
    assert(Multimodal.dHashBits(4, 4, d) === Multimodal.dHashBits(4, 4, a))
    val imgs = Seq(
      (1L, a), (2L, a), (5L, a), (3L, b), (7L, b), (9L, c), (11L, d))
      .map { case (id, px) =>
        Multimodal.HashedImage(id, Multimodal.dHashBits(4, 4, px),
          px.map(_.toByte))
      }.toDF()
    val pairs = Multimodal.imageDupPairs(imgs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L), (1L, 5L), (2L, 5L), (3L, 7L)))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The mm4 WAV path: synthesis must produce a valid RIFF container the
  * parser round-trips exactly, and the parser must degrade (None, not
  * throw) on malformed bytes — same robustness bar as the shapefile
  * reader's fuzz contract.
  */
class WavCodecSpec extends AnyFunSuite {

  private def payload(seed: Int): Array[Byte] =
    Array.tabulate(16)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("synthesized WAV parses back to the exact source samples") {
    for (seed <- 0 until 50) {
      val p = payload(seed)
      val parsed = Multimodal.parseWav(Multimodal.wavBytes(p))
      assert(parsed.isDefined, s"seed $seed failed to parse")
      val (rate, smp) = parsed.get
      assert(rate == 16000 && smp.length == 8)
      val expected = (0 until 16 by 2).map(i =>
        ((((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)) - 32768).toShort)
      assert(smp.toSeq == expected, s"seed $seed samples differ")
    }
  }

  test("parser skips unknown chunks and still finds data") {
    val base = Multimodal.wavBytes(payload(1))
    // splice a LIST chunk between fmt and data
    val insertAt = 36 // end of fmt chunk
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = base.take(insertAt) ++ extra ++ base.drop(insertAt)
    // fix the RIFF size field (bytes 4-7, LE)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val parsed = Multimodal.parseWav(spliced)
    assert(parsed.isDefined && parsed.get._2.length == 8)
  }

  test("malformed inputs return None, never throw") {
    val good = Multimodal.wavBytes(payload(2))
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](1, 2, 3),
      good.take(10),                       // truncated header
      good.take(40),                       // truncated mid-chunk
      "JUNK".getBytes("US-ASCII") ++ good.drop(4), // bad magic
      { val b = good.clone(); b(20) = 3; b },      // non-PCM fmt code
      { val b = good.clone(); b(22) = 2; b },      // stereo (unsupported)
      { val b = good.clone(); b(41) = 127; b }     // oversized data len
    )
    cases.zipWithIndex.foreach { case (c, i) =>
      val r = try Multimodal.parseWav(c)
      catch { case e: Throwable => fail(s"case $i threw ${e.getClass}") }
      assert(r.isEmpty, s"case $i parsed but should be rejected")
    }
  }

  test("mm9 frameFeatures: hand-computed energies, zero crossings, " +
       "peaks, and a ragged tail frame") {
    // payload 0..15 through the real codec: samples all negative
    // (-32767, -32253, ... step 514), so zero crossings are 0 and the
    // energies are the literal sums below (overflow INT32 — the Long
    // contract is load-bearing for frame 0)
    val p = Array.tabulate[Byte](16)(_.toByte)
    val (_, smp) = Multimodal.parseWav(Multimodal.wavBytes(p)).get
    val fr = Multimodal.frameFeatures(7L, smp, frameLen = 4).toSeq
    assert(fr === Seq(
      Multimodal.WavFrame(7L, 0, 4, 4096297044L, 0, 32767),
      Multimodal.WavFrame(7L, 1, 4, 3586935380L, 0, 30711)))
    // sign-flip counting + ragged last frame on a crafted clip
    val crafted = Array[Short](5, -3, 2, -1, 0, 7, -7, 7, 4)
    val f2 = Multimodal.frameFeatures(1L, crafted, frameLen = 4).toSeq
    assert(f2.map(w => (w.frame_idx, w.n_samples, w.n_zero_cross, w.peak)) ===
      Seq((0, 4, 3, 5), (1, 4, 2, 7), (2, 1, 0, 4)))
    assert(f2.map(_.energy) === Seq(25L + 9 + 4 + 1, 0L + 49 + 49 + 49, 16L))
  }

  test("mm11 decimate: box means floor toward -inf, partial trailing " +
       "window dropped, d=1 is identity") {
    // (-3,-4) -> floor(-3.5) = -4 (NOT truncation toward zero = -3);
    // (3,4) -> 3; trailing 9th sample dropped at d=2
    val smp = Array[Short](3, 4, -3, -4, 0, 0, 32767, 32767, 9)
    assert(Multimodal.decimate(smp, 2).toSeq === Seq(3L, -4L, 0L, 32767L))
    assert(Multimodal.decimate(smp, 1).toSeq === smp.map(_.toLong).toSeq)
    // d=4: two full windows; means floor
    assert(Multimodal.decimate(smp, 4).toSeq ===
      Seq(math.floor((3 + 4 - 3 - 4) / 4.0).toLong,
        math.floor((0 + 0 + 32767 + 32767) / 4.0).toLong))
    // clip shorter than one window -> empty output
    assert(Multimodal.decimate(Array[Short](1, 2), 4).isEmpty)
  }
}

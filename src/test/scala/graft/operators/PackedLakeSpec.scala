package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 consolidated media lake: the packed record-stream shards
  * must be a DROP-IN replacement for the one-file-per-clip lake — same
  * (doc_id, content) rows byte-for-byte — so the mm4/mm5/mm13 gates
  * keep their hashes after switching read paths. Also pins the
  * parseAvi size-clamp fix (a corrupt container declaring a ~2^31
  * chunk size must return None/skip, never allocate gigabytes — the
  * OutOfMemoryError it used to throw escapes NonFatal and broke the
  * documented never-throws contract). */
class PackedLakeSpec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("packed lake rows equal the per-file lake rows byte-for-byte " +
       "for every packed format") {
    for (ext <- Seq("wav", "bmp", "png", "avi")) {
      val perFile = Multimodal.mediaFiles(spark, dir, ext)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      val packed = Multimodal.packedMediaFiles(spark, dir, ext)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      assert(packed.keySet === perFile.keySet, s"$ext: doc set drifted")
      packed.foreach { case (id, bytes) =>
        assert(bytes.sameElements(perFile(id)), s"$ext: doc $id bytes drifted")
      }
    }
  }

  test("packed read distributes one task per shard (manifest-driven, " +
       "never binaryFile bin-packing)") {
    val df = Multimodal.packedMediaFiles(spark, dir, "avi")
    val parts = df.rdd.getNumPartitions
    // sf0.001 has fewer docs than shards, but every shard file exists
    assert(parts === Multimodal.PackedShards)
  }

  test("parseAvi clamps a corrupt declared chunk size (no gigabyte " +
       "allocation, no throw) and skips the malformed chunk") {
    val frames = (0 until 2).map(f =>
      Jpeg.encodeGray(Multimodal.blockUpscale(
        Array.tabulate[Byte](16)(i => (16 * f + i).toByte), 4, 4), 32, 32))
    val avi = Multimodal.aviBytes(frames, 32, 32)
    // find the first '00dc' chunk and declare a ~2^31 size
    def find(tag: String, from: Int): Int = {
      val t = tag.getBytes("US-ASCII")
      (from until avi.length - 4).find(i =>
        avi(i) == t(0) && avi(i + 1) == t(1) &&
        avi(i + 2) == t(2) && avi(i + 3) == t(3)).get
    }
    val at = find("00dc", find("movi", 0))
    val evil = avi.clone()
    val bb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(at + 4, Int.MaxValue - 8)
    // oversized chunk is skipped → frame count disagrees with declared
    // → None or a parse with fewer frames; EITHER is fine, throwing or
    // allocating 2 GB is not. (The walk clamps to the buffer end, so
    // the remaining frames after the liar chunk are unreachable — the
    // declared-count mismatch then drops the clip in videoFrameRows.)
    val parsed = Multimodal.parseAvi(evil)
    assert(parsed.forall { case (_, _, declared, fs) => fs.length < declared })
    // negative size must not walk backwards forever
    bb.putInt(at + 4, -12)
    assert(Multimodal.parseAvi(evil) != null) // terminates
  }
}

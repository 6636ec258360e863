package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KnnJoin differential contract: grid+certificate+residual must equal
  * brute-force kNN on corpora engineered to stress every path —
  * uniform (mostly certified), tightly clustered (certificate failures
  * → residual pass), and tiny target sets (n < k, all-residual).
  */
class KnnJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(src: DataFrame, tgt: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
      (col("sy") - col("ty")) * (col("sy") - col("ty"))
    src.select(col("src_id"), col("x").as("sx"), col("y").as("sy"))
      .crossJoin(tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty")))
      .select(col("src_id"), col("tgt_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id")).orderBy(col("d2"), col("tgt_id"))))
      .filter(col("rank") <= k)
      .select("src_id", "tgt_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def run(src: DataFrame, tgt: DataFrame, k: Int): Set[(Long, Long, Int)] =
    graft.operators.KnnJoin.knnJoin(src, tgt, k)
      .select("src_id", "tgt_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def pts(ids: Range, fx: Long => Double, fy: Long => Double,
                  idName: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, fx(i.toLong), fy(i.toLong))).toDF(idName, "x", "y")
  }

  test("uniform corpus equals brute force at k = 1, 3, 7") {
    spark.sparkContext.setLogLevel("ERROR")
    val src = pts(0 until 400, i => (i * 17 % 1000).toDouble,
      i => (i * 23 % 1000).toDouble, "src_id")
    val tgt = pts(0 until 300, i => (i * 37 % 1000).toDouble,
      i => (i * 41 % 1000).toDouble, "tgt_id")
    for (k <- Seq(1, 3, 7))
      assert(run(src, tgt, k) == brute(src, tgt, k), s"mismatch at k=$k")
  }

  test("reliable checkpointDir path equals brute force (DFS-backed " +
       "round checkpoints)") {
    val src = pts(0 until 120, i => (i * 17 % 300).toDouble,
      i => (i * 23 % 300).toDouble, "src_id")
    val tgt = pts(0 until 90, i => (i * 37 % 300).toDouble,
      i => (i * 41 % 300).toDouble, "tgt_id")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_knn_ckpt").toString
    val got = graft.operators.KnnJoin
      .knnJoin(src, tgt, 3, checkpointDir = Some(dir))
      .select("src_id", "tgt_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(src, tgt, 3))
  }

  test("clustered targets (certificate failures -> residual) equal brute force") {
    // all targets inside one 20x20 corner patch, sources spread across
    // the full extent: most sources' kth neighbor is FAR beyond one
    // cell width, so the certificate fails and the residual pass must
    // carry them — exactly
    val src = pts(0 until 200, i => (i * 29 % 1000).toDouble,
      i => (i * 31 % 1000).toDouble, "src_id")
    val tgt = pts(0 until 50, i => (i % 20).toDouble, i => (i * 7 % 20).toDouble,
      "tgt_id")
    assert(run(src, tgt, 3) == brute(src, tgt, 3))
  }

  test("95% of targets in 1% of the area (multi-round escalation) " +
       "equals brute force") {
    // the round-8 worst case: heavily clustered targets fail the r=1
    // certificate for most sources, and the old single-shot residual
    // paid |uncertified| x |targets|; the expanding ring must instead
    // certify each source once r*cellWidth exceeds its kth-neighbor
    // distance. 950 of 1000 targets sit in a 100x100 corner of the
    // 10000-wide domain (1% of the area); sources spread everywhere,
    // so kth distances range from ~1 cell to ~the domain diagonal —
    // exercising several distinct certification rounds.
    val tgt = pts(0 until 1000,
      i => if (i % 20 == 0) (i * 131 % 10000).toDouble
           else (i * 37 % 100).toDouble,
      i => if (i % 20 == 0) (i * 137 % 10000).toDouble
           else (i * 41 % 100).toDouble, "tgt_id")
    val src = pts(0 until 300, i => (i * 139 % 10000).toDouble,
      i => (i * 149 % 10000).toDouble, "src_id")
    for (k <- Seq(1, 5))
      assert(run(src, tgt, k) == brute(src, tgt, k), s"mismatch at k=$k")
  }

  test("all targets at one point, sources far away, equals brute force") {
    // degenerate density: every certificate needs the ring to reach
    // the single occupied cell AND grow past the (large) kth distance
    val tgt = pts(0 until 100, _ => 5000.0, _ => 5000.0, "tgt_id")
    val src = pts(0 until 50, i => (i * 197 % 10000).toDouble,
      i => (i * 211 % 10000).toDouble, "src_id")
    assert(run(src, tgt, 3) == brute(src, tgt, 3))
  }

  test("wide-domain corpus (coords far beyond 1000) equals brute force") {
    // The tiled Scale corpora span grid×extent (e.g. ~4000 at 10×); the
    // grid domain must FOLLOW the data — a static-extent grid clamped
    // these corpora into edge cells, failed every certificate, and
    // pushed the whole source set through the residual (measured as a
    // ~2B-row window before the domain became data-derived).
    val src = pts(0 until 300, i => (i * 131 % 8000).toDouble,
      i => (i * 137 % 8000).toDouble, "src_id")
    val tgt = pts(0 until 500, i => (i * 139 % 8000).toDouble,
      i => (i * 149 % 8000).toDouble, "tgt_id")
    assert(run(src, tgt, 3) == brute(src, tgt, 3))
  }

  test("fewer targets than k returns all targets ranked, equal to brute force") {
    val src = pts(0 until 30, i => (i * 11 % 100).toDouble,
      i => (i * 13 % 100).toDouble, "src_id")
    val tgt = pts(0 until 2, i => (i * 500 + 100).toDouble, i => 500.0, "tgt_id")
    val got = run(src, tgt, 5)
    assert(got == brute(src, tgt, 5))
    assert(got.size == 30 * 2, "each source must rank every available target")
  }
}

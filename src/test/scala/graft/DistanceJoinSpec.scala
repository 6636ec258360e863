package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistanceJoin differential contract: the g≥ε grid join must equal
  * the brute-force cross-join distance filter — across radii that span
  * sub-cell to multi-extent, on clustered corpora, and at pairs sitting
  * EXACTLY at the radius (inclusive boundary, exact in doubles for
  * integer coordinates).
  */
class DistanceJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(src: DataFrame, tgt: DataFrame, r: Double): Set[(Long, Long)] = {
    val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
      (col("sy") - col("ty")) * (col("sy") - col("ty"))
    src.select(col("src_id"), col("x").as("sx"), col("y").as("sy"))
      .crossJoin(tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty")))
      .filter(d2 <= lit(r * r))
      .select("src_id", "tgt_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
  }

  private def run(src: DataFrame, tgt: DataFrame, r: Double): Set[(Long, Long)] =
    graft.operators.DistanceJoin.distanceJoin(src, tgt, r)
      .select("src_id", "tgt_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet

  private def pts(ids: Range, fx: Long => Double, fy: Long => Double,
                  idName: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, fx(i.toLong), fy(i.toLong))).toDF(idName, "x", "y")
  }

  test("uniform corpus equals brute force across radii") {
    spark.sparkContext.setLogLevel("ERROR")
    val src = pts(0 until 400, i => (i * 17 % 1000).toDouble,
      i => (i * 23 % 1000).toDouble, "src_id")
    val tgt = pts(0 until 300, i => (i * 37 % 1000).toDouble,
      i => (i * 41 % 1000).toDouble, "tgt_id")
    // 5: far below cell width; 80: near it; 400: radius spans many
    // cells (maxCells forces g >= r, so the grid coarsens to match);
    // 2000: the whole extent is one cell -> degenerates to cross check
    for (r <- Seq(5.0, 80.0, 400.0, 2000.0)) {
      val got = run(src, tgt, r)
      assert(got == brute(src, tgt, r), s"mismatch at radius=$r")
    }
  }

  test("pairs exactly AT the radius are included (inclusive boundary)") {
    val src = pts(0 until 3, i => 100.0 + i * 300, _ => 500.0, "src_id")
    // one target exactly r=50 to the right of each source (d2 == 2500
    // exactly in doubles), one just beyond at 51
    val tgt = pts(0 until 6,
      i => 100.0 + (i % 3) * 300 + (if (i < 3) 50.0 else 51.0),
      _ => 500.0, "tgt_id")
    val got = run(src, tgt, 50.0)
    assert(got == Set((0L, 0L), (1L, 1L), (2L, 2L)))
    assert(got == brute(src, tgt, 50.0))
  }

  test("clustered corpus (all mass in one corner) equals brute force") {
    val src = pts(0 until 200, i => (i * 29 % 40).toDouble,
      i => (i * 31 % 40).toDouble, "src_id")
    val tgt = pts(0 until 80, i => (i % 25).toDouble,
      i => (i * 7 % 25).toDouble, "tgt_id")
    for (r <- Seq(3.0, 15.0))
      assert(run(src, tgt, r) == brute(src, tgt, r), s"mismatch at radius=$r")
  }

  test("no pair is emitted twice") {
    val src = pts(0 until 100, i => (i * 13 % 200).toDouble,
      i => (i * 19 % 200).toDouble, "src_id")
    val tgt = pts(0 until 100, i => (i * 7 % 200).toDouble,
      i => (i * 11 % 200).toDouble, "tgt_id")
    val rows = graft.operators.DistanceJoin.distanceJoin(src, tgt, 30.0)
      .groupBy("src_id", "tgt_id").count().filter(col("count") > 1).count()
    assert(rows == 0L, "duplicate pair emitted")
  }
}

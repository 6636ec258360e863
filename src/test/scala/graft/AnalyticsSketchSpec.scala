package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract for the repo's one rows-only gate: q17's
  * HyperLogLog++ distinct estimate must land within 5% of the exact
  * count on every group (HLL++ at default rsd 0.05; the synthetic
  * user-id cardinalities here are thousands, far above the sparse
  * regime where the sketch is exact anyway).
  */
class AnalyticsSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("approx distinct users per type within 5% of exact at sf0.01") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Analytics
      .q17ApproxDistinct(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length >= 3, "too few event types — gate near-vacuous")
    rows.foreach { r =>
      val (tpe, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(exact > 0, s"$tpe: zero exact distinct — vacuous")
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.05, f"$tpe: approx=$approx exact=$exact rel=$rel%.3f")
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The three properties that make z-order a file-pruning layout:
  * the column expression matches the reference bit-interleave, aligned
  * tiles map to contiguous z-ranges, and range-partitioned writes give
  * disjoint per-file z-extents. */
class ZCurveSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  test("column zValue equals the Scala reference and inverts exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = pts.toDF("x", "y")
      .withColumn("z", ZCurve.zValue(col("x"), col("y"), 10))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ZCurve.zValueOf(x, y, 10))
      assert(ZCurve.unZValueOf(z, 10) == ((x, y)))
    }
  }

  test("every aligned power-of-two tile is one contiguous z-range") {
    // Exhaustive over an 8-bit domain: for each tile size 2^k and each
    // aligned origin, the z-values inside the tile must be exactly the
    // interval [z(x0,y0), z(x0+s-1, y0+s-1)] — the property that turns
    // min/max file stats into an exact spatial pruner.
    val bits = 8
    val all = for (x <- 0L until 256L; y <- 0L until 256L)
      yield (x, y, ZCurve.zValueOf(x, y, bits))
    val byZ = all.map(t => t._3 -> (t._1, t._2)).toMap
    for (k <- 1 to 4; x0 <- 0L until 256L by (1L << k); y0 <- 0L until 256L by (1L << k)) {
      val s = 1L << k
      val lo = ZCurve.zValueOf(x0, y0, bits)
      val hi = ZCurve.zValueOf(x0 + s - 1, y0 + s - 1, bits)
      assert(hi - lo + 1 == s * s, s"tile ($x0,$y0) size $s: range not dense")
      (lo to hi).foreach { z =>
        val (x, y) = byZ(z)
        assert(x >= x0 && x < x0 + s && y >= y0 && y < y0 + s,
          s"z=$z escapes tile ($x0,$y0) size $s")
      }
    }
  }

  test("layoutByZ partitions cover disjoint z-ranges (file-stat pruning)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(2000)((rnd.nextInt(980).toLong, rnd.nextInt(980).toLong))
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val laid = ZCurve.layoutByZ(df, col("x"), col("y"), 10, 8)
    val ranges = laid.select(spark_partition_id().as("p"), col("zval"))
      .groupBy(col("p")).agg(min("zval").as("lo"), max("zval").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping partition z-ranges: $hi1 > $lo2")
      case _ =>
    }
    assert(ranges.length > 1, "range partitioning produced a single partition")
  }
}

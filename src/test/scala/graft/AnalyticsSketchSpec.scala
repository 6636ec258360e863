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

  test("approx quantiles: every value's rank within n/accuracy of the " +
       "target rank, per group") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val rows = graft.operators.Analytics.q18ApproxQuantiles(spark, dir).collect()
    assert(rows.length >= 8, "too few (flag, p) rows — gate near-vacuous")
    val byFlag = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val (flag, p, v, n) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      val xs = byFlag(flag)
      assert(n === xs.length)
      val err = n.toDouble / 10000 + 1
      val target = p * n
      val rankLo = xs.count(_ < v)   // smallest rank v could hold
      val rankHi = xs.count(_ <= v)  // largest rank v could hold
      assert(rankLo - err <= target && target <= rankHi + err,
        f"$flag p=$p v=$v rankLo=$rankLo rankHi=$rankHi target=$target%.1f")
      // the returned value is an actual data value, not an interpolation
      assert(xs.contains(v), s"$flag p=$p: $v not a data value")
    }
  }

  test("CMS heavy-hitter estimates: never under, over by at most eps*N") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val rows = graft.operators.Analytics.q19FrequentUsers(spark, dir).collect()
    assert(rows.length >= 6, "too few heavy hitters — gate near-vacuous")
    val totals = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (tpe, exact, est) = (r.getString(0), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"$tpe: CMS must never underestimate")
      // eps = 0.001; allow 3x slack on the probabilistic upper bound
      assert(est <= exact + (3 * 0.001 * totals(tpe)).ceil.toLong + 1,
        s"$tpe: est=$est exact=$exact N=${totals(tpe)}")
    }
  }
}

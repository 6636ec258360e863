package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the sketch family (q17/q18/q19). Since
  * round 9 the GATE payload is the exact value + a within_bounds
  * boolean (hash-exact vs DuckDB); this spec asserts the parts the
  * gate can't: the booleans actually land true on real data, the
  * exact payload matches an independently computed exact answer, and
  * the raw estimates sit within their EMPIRICALLY tighter bounds
  * (HLL++ ±5 % here vs the 3σ = 15 % gate bound).
  */
class AnalyticsSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  test("q17: within_bounds all true; raw HLL estimate within the " +
       "empirical 5% of exact per type") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Analytics.q17ApproxDistinct(spark, dir).collect()
    assert(rows.length >= 3, "too few event types — gate near-vacuous")
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: zero exact distinct")
      assert(r.getBoolean(2), s"${r.getString(0)}: sketch outside 3-sigma bound")
    }
    // estimate-level empirical contract (the gate only carries 3σ)
    val est = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    est.foreach { r =>
      val (tpe, approx, exact) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.05, f"$tpe: approx=$approx exact=$exact rel=$rel%.3f")
    }
  }

  test("q18: within_bounds all true; exact_value matches the locally " +
       "computed discrete lower quantile") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Analytics.q18ApproxQuantiles(spark, dir).collect()
    assert(rows.length >= 8, "too few (flag, p) rows — gate near-vacuous")
    val byFlag = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    rows.foreach { r =>
      val (flag, p, v, n, wb) = (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getLong(3), r.getBoolean(4))
      val xs = byFlag(flag)
      assert(n === xs.length)
      assert(wb, s"$flag p=$p: GK rank bound violated")
      // exact discrete lower quantile: value at 1-based rank ceil(p*n)
      val target = math.ceil(p * n).toInt
      assert(v === xs(target - 1),
        s"$flag p=$p: exact_value $v != ${xs(target - 1)} at rank $target")
    }
  }

  test("q21: weighted median matches a driver-side sequential " +
       "accumulation per flag") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = graft.operators.Analytics.q21WeightedMedian(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val byFlag = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .groupBy(_.getString(0))
    assert(got.keySet === byFlag.keySet)
    byFlag.foreach { case (f, rs) =>
      val wp = rs.map(r => (r.getDouble(1), r.getDouble(2).toLong))
        .sortBy(_._1)
      val total = wp.map(_._2).sum
      val half = (total + 1L) / 2L
      var cum = 0L
      val median = wp.find { case (_, w) => cum += w; cum >= half }.get._1
      assert(got(f) === ((total, median)), s"flag $f")
    }
  }

  test("q22 retention: day-0 cell equals cohort size, cells sum to " +
       "distinct user-days, no negative offsets") {
    val rows = graft.operators.Analytics.q22RetentionCohorts(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "activity before the user's cohort day")
    val acts = graft.Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts"))).distinct()
    assert(rows.map(_._3).sum === acts.count())
    // every cohort has a day-0 cell (the user's own first-activity day)
    val day0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    val cohortSizes = graft.Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(date_trunc("day", col("ts"))).as("c0"))
      .groupBy(col("c0")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(day0 === cohortSizes)
  }

  test("q19: within_bounds all true; raw CMS estimate never under, " +
       "over by at most 3*eps*N") {
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.operators.Analytics
      .q19FrequentUsers(spark, dir, emitEstimate = true).collect()
    assert(rows.length >= 6, "too few heavy hitters — gate near-vacuous")
    val totals = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (tpe, exact, wb, est) =
        (r.getString(0), r.getLong(2), r.getBoolean(4), r.getLong(5))
      assert(wb, s"$tpe: within_bounds false")
      assert(est >= exact, s"$tpe: CMS must never underestimate")
      assert(est <= exact + (3 * 0.001 * totals(tpe)).ceil.toLong + 1,
        s"$tpe: est=$est exact=$exact N=${totals(tpe)}")
    }
  }
}

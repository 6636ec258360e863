package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ranks

/** Direct contract tests for the distributed global-rank helper: the
  * range-exchange + per-partition-offset scheme must assign exactly the
  * ranks a global sort would, for any partitioning, including ties in
  * the leading sort key, empty inputs, and running sums. */
class RanksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "7") // deliberately odd
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  test("withGlobalRank assigns the exact global-sort ranks with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // many duplicate weights → the id tie-break decides
    val rows = (1 to 5000).map(i => (f"id$i%05d", rnd.nextInt(40).toDouble))
    val df = rows.toDF("id", "w").repartition(13)
    val ranked = Ranks.withGlobalRank(df, Seq(col("w").desc, col("id").asc))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(ranked.length === 5000)
    assert(ranked.map(_._3).sorted.toSeq === (1L to 5000L))
    val expected = rows.sortBy { case (id, w) => (-w, id) }.map(_._1)
    val got = ranked.sortBy(_._3).map(_._1).toSeq
    assert(got === expected)
  }

  test("runningTotals computes exact prefix sums and grand totals") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i, if (i % 3 == 0) 1L else 0L))
    val df = rows.toDF("k", "v").repartition(9)
    val rt = Ranks.runningTotals(df, Seq(col("k").asc),
      Seq(col("v")), Seq("cum"), rankCol = "rank")
    assert(rt.totals === Seq(2000L, rows.map(_._2).sum))
    val got = rt.df.collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).sortBy(_._2)
    var cum = 0L
    got.zipWithIndex.foreach { case ((k, rank, c), i) =>
      assert(rank === i + 1)
      assert(k === i + 1) // ordering by k ascending
      cum += (if (k % 3 == 0) 1L else 0L)
      assert(c === cum, s"prefix sum at rank $rank")
    }
  }

  test("empty input yields empty output and zero totals") {
    import spark.implicits._
    val df = Seq.empty[(String, Double)].toDF("id", "w")
    val rt = Ranks.runningTotals(df, Seq(col("w").desc),
      Seq(lit(1L)), Seq("cum"))
    assert(rt.totals === Seq(0L, 0L))
    assert(rt.df.count() === 0)
  }
}

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

  test("randomized differential: ranks and prefix sums match brute force " +
       "across sizes, partitionings, skew, and null values") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 8) {
      val n = 1 + rnd.nextInt(3000)
      val parts = 1 + rnd.nextInt(16)
      // heavy ties + a skewed hot key + nullable value column (the
      // pass-1/pass-2 null-skip path: null contributes 0 to sums)
      val rows = (1 to n).map { i =>
        val w = if (rnd.nextInt(4) == 0) 7.0 else rnd.nextInt(25).toDouble
        val v: java.lang.Long =
          if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(9))
        (f"k$i%06d", w, v)
      }
      val df = rows.toDF("id", "w", "v").repartition(parts)
      val rt = Ranks.runningTotals(df, Seq(col("w").desc, col("id").asc),
        Seq(col("v")), Seq("cum"), rankCol = "rank")
      val expectedOrder = rows.sortBy { case (id, w, _) => (-w, id) }
      val expectedTotal = rows.map(r => Option(r._3).map(_.longValue).getOrElse(0L)).sum
      assert(rt.totals === Seq(n.toLong, expectedTotal), s"trial $trial totals")
      val got = rt.df.collect()
        .map(r => (r.getString(0), r.getLong(r.fieldIndex("rank")),
          r.getLong(r.fieldIndex("cum"))))
        .sortBy(_._2)
      assert(got.map(_._1).toSeq === expectedOrder.map(_._1),
        s"trial $trial (n=$n parts=$parts) rank order")
      var cum = 0L
      got.zip(expectedOrder).foreach { case ((id, rank, c), (_, _, v)) =>
        cum += Option(v).map(_.longValue).getOrElse(0L)
        assert(c === cum, s"trial $trial prefix at rank $rank")
      }
    }
  }

  test("groupOffsets orders keys like the range exchange: UTF-8 binary " +
       "(not UTF-16), NULL first") {
    // U+E000 (private use, 3 UTF-8 bytes starting 0xEE) vs U+10000
    // (supplementary, surrogate pair in UTF-16, 4 UTF-8 bytes 0xF0…):
    // UTF-16 code-unit order puts the surrogate (0xD800) BEFORE 0xE000;
    // UTF-8 binary order puts 0xEE before 0xF0 — opposite orders
    val bmp = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(supp) > 0, "sanity: UTF-16 order disagrees")
    val (offs, nullOff) = Ranks.groupOffsets(
      Seq((supp, 30L), (bmp, 10L), (null, 3L)))
    // Spark range order: NULL (end 3), bmp (end 10), supp (end 30)
    assert(nullOff == 0L)
    assert(offs(bmp) == 3L, s"bmp offset ${offs(bmp)}")
    assert(offs(supp) == 10L, s"supp offset ${offs(supp)}")
    // totals variant: same order, prefix sums
    val (offs2, nullOff2) = Ranks.groupOffsetsFromTotals(
      Seq((supp, 20L), (bmp, 7L), (null, 3L)))
    assert(nullOff2 == 0L && offs2(bmp) == 3L && offs2(supp) == 10L)
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

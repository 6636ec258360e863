package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{SpatialJoin, Progressive}

/** Scale stress harness (dev tool): derive dense rectangle relations
  * from the largest fact tables (lineitem x orders) at constant
  * spatial density and push them through the join core. This is the
  * local stand-in for the 100 TB question — does candidate volume,
  * shuffle size, and verification cost scale linearly with input?
  * Usage: runMain graft.Stress [sfDir]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // space scaled so density stays constant as row count grows
    val li = Tables.lineitem(spark, sfDir)
    val nLi = li.count()
    val space = math.max(1000L, math.round(math.sqrt(nLi.toDouble)) * 25)
    def box(key: org.apache.spark.sql.Column, sz: org.apache.spark.sql.Column) = {
      val xmin = (key * 13) % (space - 20)
      val ymin = (key * 29) % (space - 20)
      concat(lit("POLYGON(("),
        xmin, lit(" "), ymin, lit(", "),
        xmin + sz, lit(" "), ymin, lit(", "),
        xmin + sz, lit(" "), ymin + sz, lit(", "),
        xmin, lit(" "), ymin + sz, lit(", "),
        xmin, lit(" "), ymin, lit("))"))
    }
    // id must be UNIQUE (the engine's entity contract, like the
    // reference's originalID) — the synthetic lineitem even has
    // duplicate (orderkey, linenumber) pairs, so synthesize a unique
    // surrogate id (stable across recomputes for a fixed file layout)
    val src = SpatialJoin.entities(
      li.select(monotonically_increasing_id().as("id"),
        box(col("l_orderkey") * 7 + col("l_linenumber"),
          lit(1) + (col("l_partkey") % 10)).as("wkt")),
      col("id"), col("wkt"))
    val tgt = SpatialJoin.entities(
      Tables.orders(spark, sfDir).select(col("o_orderkey").as("id"),
        box(col("o_orderkey") * 11, lit(1) + (col("o_custkey") % 12)).as("wkt")),
      col("id"), col("wkt"))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val nSrc = time("load+count source")(src.count())
    val nTgt = time("load+count target")(tgt.count())
    println(s"[stress] space=$space src=$nSrc tgt=$nTgt")
    val theta = time("theta")(SpatialJoin.computeTheta(src))
    println(s"[stress] theta=$theta")
    val cands = time("candidate count")(
      SpatialJoin.candidatePairs(src, tgt, theta).count())
    println(s"[stress] candidates=$cands")
    val verified = time("de9im relation counts")(
      SpatialJoin.relationCounts(src, tgt).collect()(0))
    println(s"[stress] counts=$verified")
    val top = time("progressive top-100k by MBRO")(
      Progressive.progressiveVerify(src, tgt, "w_mbro", 100000).count())
    println(s"[stress] progressive rows=$top")
    // real-budget shape check: no single-partition window / TakeOrdered
    // may appear at budget 1M (reference budgets are 5M-50M)
    val top1m = time("progressive top-1M by JS")(
      Progressive.progressiveVerify(src, tgt, "w_js", 1000000).count())
    println(s"[stress] progressive-1M rows=$top1m")
    val curve = time("pgr curve, budget 1M")(
      Progressive.pgrCurve(src, tgt, "w_js", "intersects", 1000000).collect().length)
    println(s"[stress] pgr checkpoints=$curve")
    val typedCount = time("typed cogroup+index de9im count")(
      graft.operators.TypedGiant.de9im(src, tgt).count())
    println(s"[stress] typed pairs=$typedCount")

    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

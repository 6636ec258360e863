package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost dissection of the triangle-counting family (round 15):
  * times each sub-plan of [[graft.operators.GraphOps.triangleCounts]]
  * over the gr4 pair graph so the optimization work targets the
  * segment that actually costs. Development tool, not part of the
  * driver contract.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.GraphProbe <sfDir>
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs = graft.spark.DfCache.memo(spark, s"$sfDir#gr4pairs") {
      graft.operators.TextOps.dd3JaccardPairs(spark, sfDir)
        .select(col("id_a").as("a"), col("id_b").as("b"))
    }
    println(s"[probe] pairs=${pairs.count()}")

    def time(name: String, runs: Int = 3)(df: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Bench.materializedCount(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString("/")}")
    }

    val deg = pairs.select(col("a").as("id"))
      .unionByName(pairs.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val withDeg = pairs
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("lo"),
      when(fwd, col("b")).otherwise(col("a")).as("hi"),
      when(fwd, col("db")).otherwise(col("da")).as("hid"))
    val e1 = oriented.select(col("lo").as("u"), col("hi").as("x"), col("hid").as("xd"))
    val e2 = oriented.select(col("lo").as("u"), col("hi").as("y"), col("hid").as("yd"))
    val wedges = e1.join(e2, "u")
      .filter(col("xd") < col("yd") ||
        (col("xd") === col("yd") && col("x") < col("y")))
      .select(col("u"), col("x"), col("y"))
    val tri = wedges.join(
      oriented.select(col("lo").as("x"), col("hi").as("y")), Seq("x", "y"))
    val inc = tri.select(col("u").as("id"))
      .unionByName(tri.select(col("x").as("id")))
      .unionByName(tri.select(col("y").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("tc"))
    val full = deg.join(inc, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("tc"), lit(0L)).as("tri_cnt"))

    time("deg")(deg)
    time("withDeg")(withDeg)
    time("oriented")(oriented)
    time("wedges")(wedges)
    time("tri")(tri)
    time("inc")(inc)
    time("full")(full)
    time("full+sort")(full.orderBy(col("id")))
    time("gr4 gate") {
      graft.operators.GraphOps.gr4TriangleCount(spark, sfDir)
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

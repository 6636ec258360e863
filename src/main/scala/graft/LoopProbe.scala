package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost dissection of the frontier-loop family (gr8 BFS / gr10
  * SSSP, round 16): times each sub-plan of one loop round over the
  * gate's real inputs so the optimization targets the segment that
  * actually costs. Development tool, not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.LoopProbe <sfDir>
  */
object LoopProbe {
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

    def time(name: String, runs: Int = 3)(act: => Unit): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        act
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[loopprobe] $name%-30s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString("/")}")
    }

    val edges = graft.operators.GraphOps.interactionEdges(spark, sfDir)
    println(s"[loopprobe] edges=${edges.count()} nodes=" +
      edges.select("src").distinct().count())

    val seeds = graft.Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey") === 0)
      .select((col("s_suppkey").cast("long") * 2 + 1).as("id"))
    println(s"[loopprobe] seeds=${seeds.count()}")

    time("edges repartition+persist") {
      val e = edges.select(col("src"), col("dst"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e.unpersist(blocking = true); ()
    }

    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()

    val reached0 = graft.spark.Checkpoints.cut(
      seeds.select(col("id")).distinct().withColumn("dist", lit(0)), None)

    time("cut(seed distinct)") {
      graft.spark.Checkpoints.cut(
        seeds.select(col("id")).distinct().withColumn("dist", lit(0)), None); ()
    }
    locally {
      val frontier = reached0.filter(col("dist") === 0).select(col("id"))
      val j = e.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
      Bench.materializedCount(j)
      println("[loopprobe] round-join final plan:\n" +
        j.queryExecution.executedPlan.toString.linesIterator.take(12)
          .mkString("\n"))
    }
    time("round: join+distinct") {
      val frontier = reached0.filter(col("dist") === 0).select(col("id"))
      Bench.materializedCount(
        e.join(frontier.select(col("id").as("src")), "src")
          .select(col("dst").as("id")).distinct()); ()
    }
    time("round: +antijoin") {
      val frontier = reached0.filter(col("dist") === 0).select(col("id"))
      Bench.materializedCount(
        e.join(frontier.select(col("id").as("src")), "src")
          .select(col("dst").as("id")).distinct()
          .join(reached0.select(col("id")), Seq("id"), "left_anti")
          .withColumn("dist", lit(1))); ()
    }
    time("round: full (union+cut)") {
      val frontier = reached0.filter(col("dist") === 0).select(col("id"))
      val next = e.join(frontier.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(reached0.select(col("id")), Seq("id"), "left_anti")
        .withColumn("dist", lit(1))
      graft.spark.Checkpoints.cut(reached0.unionByName(next), None); ()
    }
    time("gr8 whole gate") {
      Bench.materializedCount(
        graft.operators.GraphOps.gr8BfsReach(spark, sfDir)); ()
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

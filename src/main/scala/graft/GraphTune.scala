package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for the iterative graph kernels' two
  * exchange plans (round 12): runs pagerank / labelPropagation over
  * the scaled interaction edge frame under BOTH the node-broadcast
  * plan and the shuffle plan, interleaved min-of-2 each (bcast,
  * shuffle, bcast, shuffle) so host drift lands on both evenly.
  * Prints one line per (kernel, plan). Used to set the
  * broadcast*Max defaults with data instead of intuition.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.GraphTune
  *   /root/testdata/sf0.1 100 /root/repo/scale [pr,lp]"
  */
object GraphTune {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).getOrElse("100").toInt
    val outBase = args.lift(2).getOrElse("/root/repo/scale")
    val kernels = args.lift(3).getOrElse("pr,lp").split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.ScaleCorpus.ensureScaledDir(spark, baseDir, mult, outBase)
    val ge = graft.spark.DfCache.memo(spark, s"tune#edges#$baseDir#$mult") {
      graft.sources.ScaleCorpus.scaledEdges(spark,
        graft.operators.GraphOps.interactionEdges(spark, baseDir), mult)
    }
    ge.count() // materialize the memo untimed
    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def pair(name: String, bcast: => Long, shuffle: => Long): Unit = {
      val b1 = time(bcast); val s1 = time(shuffle)
      val b2 = time(bcast); val s2 = time(shuffle)
      println(f"[graph-tune] $name bcast=${math.min(b1, b2)}%.1fs " +
        f"(runs $b1%.1f/$b2%.1f) shuffle=${math.min(s1, s2)}%.1fs " +
        f"(runs $s1%.1f/$s2%.1f)")
    }
    if (kernels("lp"))
      pair("labelProp(rounds=3)",
        graft.operators.GraphOps.labelPropagation(ge, rounds = 3).count(),
        graft.operators.GraphOps.labelPropagation(ge, rounds = 3,
          broadcastLabelsMax = 0L).count())
    if (kernels("pr"))
      pair("pagerank(iters=3)", {
        // broadcastRanksMax=MaxValue forces the broadcast plan — the
        // default is 0 (shuffle), so going through pagerank() here
        // would measure shuffle-vs-shuffle (round-12 advisory)
        val gn = ge.select(col("src").as("id")).distinct()
        val gc = gn.count()
        graft.operators.GraphOps.pagerankWeighted(
          ge.withColumn("w", lit(1L)),
          gn.select(col("id"), lit(1.0 / gc.toDouble).as("w")),
          broadcastRanksMax = Long.MaxValue).count()
      }, {
        val gn = ge.select(col("src").as("id")).distinct()
        val gc = gn.count()
        graft.operators.GraphOps.pagerankWeighted(
          ge.withColumn("w", lit(1L)),
          gn.select(col("id"), lit(1.0 / gc.toDouble).as("w")),
          broadcastRanksMax = 0L).count()
      })
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

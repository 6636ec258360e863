package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Evaluation, GeoQueries, SpatialJoin}

/** Experiment harness mirroring the reference's published experiment
  * shape (DS-JedAI TSAS-Experiments scripts): batch GIA.nt headline
  * counts, then a budget x weighting sweep of progressive quality
  * (recall / precision / PGR), on the derived geometry relations.
  * Usage: runMain graft.Experiments [sfDir]
  */
object Experiments {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val src = GeoQueries.partBoxes(spark, sfDir)
    val tgt = GeoQueries.supplierBoxes(spark, sfDir)

    val (counts, tBatch) = timed(SpatialJoin.relationCounts(src, tgt).collect()(0))
    println(f"[exp] GIANT batch: ${tBatch}%.2f s  counts=$counts")

    // 'contains' is selective on this data (unlike intersects, where
    // every rectangle candidate qualifies) — scheduling quality shows.
    println(f"[exp] relation=contains")
    println(f"[exp] ${"budget"}%8s ${"weight"}%8s ${"recall"}%8s ${"precision"}%10s ${"pgr"}%8s ${"time"}%8s")
    for (budget <- Seq(20, 50, 200); weight <- Seq("w_js", "w_mbro", "w_cf")) {
      val (q, t) = timed(Evaluation.evaluateProgressive(src, tgt, weight, budget,
        relation = "contains"))
      println(f"[exp] $budget%8d $weight%8s ${q.recall}%8.3f ${q.precision}%10.3f ${q.pgr}%8.3f $t%7.2fs")
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 dissection of the orderBy anomaly on the triangle output:
  * the unsorted frame materializes in ~0.1 s warm while orderBy(id)
  * costs 17-26 s per run. Times the sort expressed several ways to
  * find which physical piece pays. Development tool.
  */
object SortProbe {
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
    def tri() = graft.operators.GraphOps.triangleCounts(pairs)

    def time(name: String, runs: Int = 3)(df: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Bench.materializedCount(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-34s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString("/")}")
    }

    time("tri plain")(tri())
    time("tri orderBy(id)")(tri().orderBy(col("id")))
    // lineage-cut hypothesis: the memoized pairs frame is persisted but
    // its RDD lineage (the whole dd3 build DAG) is serialized into
    // EVERY downstream task binary — cut it and re-measure
    val pairsCut = pairs.localCheckpoint()
    println(s"[probe] pairsCut=${pairsCut.count()}")
    def triCut() = graft.operators.GraphOps.triangleCounts(pairsCut)
    time("triCut plain")(triCut())
    time("triCut orderBy(id)")(triCut().orderBy(col("id")))
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

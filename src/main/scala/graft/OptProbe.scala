package graft

import org.apache.spark.sql.SparkSession

/** Quick multi-gate timing probe for optimization iteration: runs the
  * named gates in ONE session with the Bench per-gate methodology
  * (run 1 discarded for cache isolation, headline = min of N warm
  * materialized runs; st gates = median). Cheaper than a full Bench
  * when comparing a before/after delta on a handful of gates —
  * absolute numbers are only comparable across OptProbe runs with the
  * same gate list (session-shared caches), so use Bench/BenchOne for
  * committed claims. Development tool, not part of the driver
  * contract.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.OptProbe <sfDir> <q1,q2,..> [warmRuns]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val warm = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val runs = (0 to warm).map { _ =>
        val t0 = System.nanoTime()
        Bench.materializedCount(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      val headline =
        if (n.startsWith("st")) { val s = runs.tail.sorted; s((s.length - 1) / 2) }
        else runs.tail.min
      println(f"OPTPROBE $n $headline%.3f runs=${runs.map(t => f"$t%.3f").mkString("/")}")
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

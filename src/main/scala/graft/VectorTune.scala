package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ann21 serving-quality sweep (round-14 judge item 3): beam search
  * over the kNN serving graph at several graph DEGREES, next to the
  * IVF probe path (ann18) it is supposed to match or beat, with the
  * mean recall@3 and wall seconds per arm. The r13 sign-off shipped a
  * k=3 graph whose beam recall (0.233) was below the IVF probe's
  * (0.40) — the serving gate was signing off a worse index than ann5.
  * This main is the measured basis for the degree the gate bakes in.
  *
  * Usage: sbt "runMain graft.VectorTune /root/testdata/sf0.01"
  */
object VectorTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timedRecall(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = df.agg(avg(col("recall"))).head.getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[vectortune] $label%-28s recall@3=$r%.3f  ${dt}%6.1fs")
    }
    timedRecall("ann18_ivf_probe") {
      graft.operators.VectorOps.ann18RecallEval(spark, dir) }
    for (deg <- Seq(3, 6, 8, 12)) {
      timedRecall(s"ann21_beam_degree_$deg") {
        graft.operators.VectorOps.ann21BeamRecall(spark, dir, degree = deg) }
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

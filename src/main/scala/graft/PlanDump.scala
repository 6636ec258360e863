package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Writes `.explain("formatted")` output for the named gates to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence
  * the optimization rounds commit beside the code. Development tool,
  * not part of the driver contract.
  *
  * Usage: runMain graft.PlanDump <sfDir> <tagDir> <suffix> <q1,q2,...>
  * e.g.   runMain graft.PlanDump /root/testdata/sf0.1 plans/r15 before gr4_triangle_count
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tagDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("/root/repo", tagDir)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // execute once so AQE finalizes (isFinalPlan=true): the dumped
      // plan is the one a consumer actually runs, including runtime
      // join-strategy changes and coalesced exchanges
      try Bench.materializedCount(df)
      catch { case e: Throwable => println(s"[plandump] $n exec failed: $e") }
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(dir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${dir.resolve(s"${n}_$suffix.txt")} (${txt.length} chars)")
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

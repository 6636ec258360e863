package graft
import org.apache.spark.sql.SparkSession

/** Single-gate isolated measurement child for [[Bench]]'s cross-run
  * drift arbitration (round 13). Runs ONE gate in a fresh JVM + fresh
  * Spark session with the exact Bench per-gate methodology (run 1
  * discarded for cache isolation; batch headline = min of 2 warm runs;
  * st gates = median of 3 warm runs) and prints one parseable line:
  *
  *   BENCHONE <gate> <headline_sec> runs=<r1/r2/...>
  *
  * A fresh process has an empty block manager, no accumulated GC load,
  * and no session-shared caches from 180 other gates — the cleanest
  * measurement the host can produce, which is what arbitrates "code
  * got slower since the last committed run" from "the host was busy
  * for the whole bench" (the r12 phantom st11/st12 2x lesson).
  *
  * Usage: graft.BenchOne <gateName> <sfDir> [cpus]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val gate = args(0)
    val sfDir = args(1)
    val cpus = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same JVM/codegen warmup as Bench so run 1 isolates the gate's own
    // cache population, not session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    val fn = SparkEntry.queries(gate)
    val isStream = gate.startsWith("st")
    val nRuns = args.lift(3).map(_.toInt)
      .getOrElse(if (isStream) 4 else 3)
    val runs = (1 to nRuns).map { _ =>
      val t0 = System.nanoTime()
      Bench.materializedCount(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    // batch: min of the warm runs (with the arbitration default of 8
    // runs the min sits past the fresh-JVM JIT ramp — see
    // Bench.isolatedHeadline); st: median of the warm runs
    val headline =
      if (isStream) { val s = runs.tail.sorted; s((s.length - 1) / 2) }
      else runs.tail.min
    println(f"BENCHONE $gate $headline%.3f runs=${runs.map(t => f"$t%.3f").mkString("/")}")
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

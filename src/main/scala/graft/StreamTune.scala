package graft

import org.apache.spark.sql.SparkSession

/** One-off streaming state-store provider comparison (the round-10
  * RocksDB tuning experiment): runs the st1/st2 file-source scale
  * harnesses at a given corpus dir under the in-memory provider and
  * the (tuned) RocksDB provider and prints one JSON line per run.
  * The tuning itself lives in [[graft.streaming.EventStream.RocksDbTuning]]
  * and is applied by every RocksDB harness run, so what this main
  * measures is exactly what Scale records.
  *
  * Usage: runMain graft.StreamTune <dataDir> [st1|st2|both]
  */
object StreamTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scale/sf0.1x100")
    val which = args.lift(1).getOrElse("st2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rocks = Some(graft.streaming.EventStream.RocksDbProvider)
    // Host noise on this shared box swamps single runs (the same
    // harness has measured 42 s and 58 s minutes apart) — interleave
    // the providers and take min-of-2 per provider, Bench methodology.
    def minOf2(run: () => (Double, Long, Long),
               other: () => (Double, Long, Long))
        : ((Double, Long, Long), (Double, Long, Long)) = {
      val a1 = run(); val b1 = other(); val a2 = run(); val b2 = other()
      (if (a1._1 <= a2._1) a1 else a2, if (b1._1 <= b2._1) b1 else b2)
    }
    def report(name: String, r: (Double, Long, Long)): Unit =
      println(f"""{"run":"$name","sec":${r._1}%.3f,"rows":${r._2},"state_rows":${r._3}}""")
    if (which == "st2" || which == "both") {
      val (m, r) = minOf2(
        () => graft.streaming.EventStream.intervalJoinFileStats(spark, dir),
        () => graft.streaming.EventStream.intervalJoinFileStats(spark, dir, rocks))
      report("st2_file_mem", m); report("st2_file_rocksdb_tuned", r)
    }
    if (which == "st1" || which == "both") {
      val (m, r) = minOf2(
        () => graft.streaming.EventStream.sessionizeFileStats(spark, dir),
        () => graft.streaming.EventStream.sessionizeFileStats(spark, dir, rocks))
      report("st1_file_mem", m); report("st1_file_rocksdb_tuned", r)
    }
    spark.stop()
  }
}

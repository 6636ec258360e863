package graft

import org.apache.spark.sql.SparkSession

/** One-off harness experiment: per-gate cost of the MemoryStream replay
  * gates under a given gate-session state-partition count
  * (`GRAFT_GATE_STATE_PARTITIONS`, default 4 — see
  * [[graft.streaming.EventStream]]; keep this default in sync with
  * `defaultGateParts` there, the label below reports it). Bench
  * methodology: one discarded warm-up run, headline = min of two
  * timed runs.
  *
  * Usage: GRAFT_GATE_STATE_PARTITIONS=4 sbt "runMain graft.GateTune /root/testdata/sf0.1"
  */
object GateTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val es = graft.streaming.EventStream
    val gates: Seq[(String, () => Long)] = Seq(
      "st1" -> (() => es.sessionizeGate(spark, dir).count()),
      "st2" -> (() => es.intervalJoinGate(spark, dir).count()),
      "st9" -> (() => es.intervalJoinOuterGate(spark, dir).count()),
      "st10" -> (() => es.sessionWindowGate(spark, dir).count()))
    val parts = sys.env.getOrElse("GRAFT_GATE_STATE_PARTITIONS", "4")
    gates.foreach { case (name, f) =>
      f() // discarded cache/JIT warm-up
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"gate":"$name","parts":$parts,"sec":${ts.min}%.3f}""")
    }
    spark.stop()
  }
}

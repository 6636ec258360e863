package graft

import org.apache.spark.sql.SparkSession

/** Harness-cost measurement for a gate-name prefix (default: the st*
  * streaming family): every matching SparkEntry query runs once
  * discarded (cache/JIT isolation) + three timed, reporting the
  * MEDIAN and the min–max spread — the Bench methodology for st gates
  * since round 11 (the min-of-2 headline hid regressions inside
  * streaming replay variance; the judged criterion reads spread ≤1.3×
  * on the raw triples). `GRAFT_GATE_STATE_PARTITIONS` overrides the
  * replay gates' state-partition count for tuning experiments (keep
  * the default in sync with `defaultGateParts` in
  * [[graft.streaming.EventStream]]).
  *
  * Usage: GRAFT_GATE_STATE_PARTITIONS=4 \
  *   sbt "runMain graft.GateTune /root/testdata/sf0.1 st"
  */
object GateTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefix = args.lift(1).getOrElse("st")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = sys.env.getOrElse("GRAFT_GATE_STATE_PARTITIONS", "4")
    var total = 0.0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        Bench.materializedCount(fn(spark, dir)) // discarded warm-up
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Bench.materializedCount(fn(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        total += ts(1)
        println(f"""{"gate":"$name","parts":$parts,"median":${ts(1)}%.3f,""" +
          f""""min":${ts.head}%.3f,"max":${ts.last}%.3f,""" +
          f""""spread":${ts.last / math.max(ts.head, 1e-9)}%.2f}""")
      }
    println(f"""{"prefix":"$prefix","median_total":$total%.2f}""")
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main for the RocksDB tuning experiment: runs st2's
  * file-source interval join once under a chosen provider and prints
  * the aggregated micro-batch duration breakdown plus the state
  * operator's custom metrics — i.e. WHERE the provider's time goes
  * (addBatch vs state commit vs maintenance), which single totals
  * can't show.
  *
  * Usage: runMain graft.StreamProfile <dataDir> [mem|rocks]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scale/sf0.1x100")
    val mode = args.lift(1).getOrElse("rocks")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", "8")
    // recentProgress is a ring buffer (default 100 entries); with
    // maxFilesPerTrigger=1 a >100-part-file corpus would silently
    // truncate the duration/metric sums this tool exists to produce
    sess.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    if (mode == "rocks") {
      sess.conf.set("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.EventStream.RocksDbProvider)
      graft.streaming.EventStream.RocksDbTuning.foreach {
        case (k, v) => sess.conf.set(k, v)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft_profile").toString
    val src = graft.streaming.EventStream.readEvents(sess, dir,
      maxFilesPerTrigger = Some(1))
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStream.intervalJoin(
        src.filter(col("event_type") === "error"),
        src.filter(col("event_type") === "click"))
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", s"$out/_ckpt")
      .option("path", s"$out/data").start()
    q.processAllAvailable()
    val progresses = q.recentProgress
    q.stop()
    println(f"total_sec ${(System.nanoTime() - t0) / 1e9}%.1f " +
      s"batches ${progresses.length}")
    val durKeys = progresses.flatMap(_.durationMs.keySet.toArray).distinct
    durKeys.foreach { k =>
      val tot = progresses.map(p =>
        Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)).sum
      println(f"durationMs.$k%-28s ${tot / 1000.0}%8.1f s")
    }
    val customTotals = scala.collection.mutable.Map.empty[String, Long]
    progresses.foreach(_.stateOperators.foreach { so =>
      so.customMetrics.forEach { (k, v) =>
        customTotals(k) = customTotals.getOrElse(k, 0L) + v.longValue
      }
    })
    customTotals.toSeq.sortBy(-_._2).take(20).foreach { case (k, v) =>
      println(f"state.$k%-40s $v%12d")
    }
    spark.stop()
  }
}

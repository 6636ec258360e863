package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for ONE replay gate's micro-batch cost breakdown:
  * runs the gate once and prints per-progress durationMs entries
  * (addBatch / getBatch / commitOffsets / walCommit / queryPlanning /
  * triggerExecution) summed across batches — where the seconds
  * actually go, which GateTune's totals can't show.
  *
  * Usage: runMain graft.StreamTune /root/testdata/sf0.1 st9
  */
object StreamTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("st9")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val es = graft.streaming.EventStream
    val parts = sys.env.getOrElse("GRAFT_GATE_STATE_PARTITIONS", "4")
    // replica of the st2/st9/st12 replay harness with the query handle
    // kept, so recentProgress is readable after the run
    val rows = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("error", "click"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    for (attempt <- 1 to 2) {
      val sess = spark.newSession()
      sess.conf.set("spark.sql.shuffle.partitions", parts)
      import sess.implicits._
      implicit val ctx: org.apache.spark.sql.SQLContext = sess.sqlContext
      val memE = MemoryStream[(Long, Long, Long)]
      val memC = MemoryStream[(Long, Long, Long)]
      def toEvents(m: MemoryStream[(Long, Long, Long)]) =
        m.toDF().toDF("event_id", "user_id", "us")
          .withColumn("ts", timestamp_micros(col("us")))
      val joined = which match {
        case "st2" => es.intervalJoin(toEvents(memE), toEvents(memC))
        case "st12" => es.semiJoin(toEvents(memE), toEvents(memC))
        case _ => es.intervalJoinOuter(toEvents(memE), toEvents(memC))
      }
      val t0 = System.nanoTime()
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(s"tune_$attempt").start()
      val chunk = math.max(1, (rows.length + 1) / 2)
      rows.grouped(chunk).foreach { batch =>
        val (e, c) = batch.partition(_._4 == "error")
        memE.addData(e.map(r => (r._1, r._2, r._3)).toIndexedSeq)
        memC.addData(c.map(r => (r._1, r._2, r._3)).toIndexedSeq)
        q.processAllAvailable()
      }
      val maxUs = rows.iterator.map(_._3).max
      val day = 24L * 3600L * 1000000L
      for (i <- 1 to 2) {
        memE.addData((-i.toLong, -999L, maxUs + i * day))
        memC.addData((-i.toLong, -999L, maxUs + i * day))
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      q.stop()
      println(f"attempt $attempt total_sec $sec%.2f batches ${progress.length}")
      val durations = scala.collection.mutable.Map.empty[String, Long]
      progress.foreach(_.durationMs.forEach { (k, v) =>
        durations(k) = durations.getOrElse(k, 0L) + v.longValue })
      durations.toSeq.sortBy(-_._2).foreach { case (k, v) =>
        println(f"  durationMs.$k%-28s ${v / 1000.0}%8.2f s")
      }
      progress.foreach { p =>
        println(f"  batch ${p.batchId} trigger=${p.durationMs.get("triggerExecution")}ms " +
          s"rows=${p.numInputRows}")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scheduling-vs-work dissection (round 15): runs one gate and counts
  * jobs/stages/tasks plus summed executor task time via a listener.
  * If wall-clock >> total task time / cores, the cost is driver/AQE
  * scheduling machinery, not data work. Development tool.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.StageProbe <sfDir> <gate> [runs]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gate = args.lift(1).getOrElse("gr4_triangle_count")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        }
      }
    })

    val fn = SparkEntry.queries(gate)
    (1 to runs).foreach { i =>
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      Bench.materializedCount(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"[stageprobe] $gate run$i wall=$wall%.2fs jobs=${jobs.get} " +
        f"stages=${stages.get} tasks=${tasks.get} taskTime=${taskMs.get / 1000.0}%.2fs " +
        f"gc=${gcMs.get / 1000.0}%.2fs")
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

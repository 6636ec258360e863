package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection: prints formatted physical plans and timings
  * for selected queries. Development tool, not part of the driver
  * contract. Usage: runMain graft.PlanCheck <sfDir> <query...>
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("sp2_box_intersects")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"========== $n ==========")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"--> $n: rows=$c time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

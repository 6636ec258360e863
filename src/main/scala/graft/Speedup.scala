package graft

import org.apache.spark.sql.SparkSession

/** Strong-scaling (speedup) experiment — the reference's OWN second
  * evaluation axis (`TSAS-Experiments/speedupExp.sh`: the same job at
  * cores.max 2/4/8/16) next to Scale's scale-up curve: a fixed corpus,
  * the flagship batch queries, one fresh local[N] session per core
  * count. Wall time should fall with cores until the fixed plan /
  * driver costs floor it — the curve is the evidence that the plans
  * actually parallelize (no single-partition stages hiding anywhere).
  *
  * Methodology matches Bench: per session, each query gets one
  * DISCARDED cache-population run, then min-of-2 warm runs;
  * shuffle.partitions = N so the shuffle layout scales with the
  * session (what a real cluster resize does).
  *
  * Usage: runMain graft.Speedup [sfDir] [coreList] [queryList]
  *   e.g.  runMain graft.Speedup /root/testdata/sf0.1 2,8,32
  *         runMain graft.Speedup /root/repo/scale/sf0.1x100 2,8,32 \
  *           dd5_lsh_pairs,ann8_ivfpq_topk,cp7_full_curation
  * (scaled corpora carry only the documents/embeddings/events tables,
  * so pass a doc/vector query list there — the 100× corpus is where
  * the curve is informative; gate-scale queries floor at fixed costs.)
  */
object Speedup {

  private val flagships = Seq(
    "q1_pricing_summary",   // full-scan hash agg
    "sp3_relation_counts",  // tile join + DE-9IM verify + 11-way agg
    "sp12_balanced_im",     // skew-balanced join
    "pr1_progressive_mbro", // global ranking + budgeted verify
    "dd5_lsh_pairs",        // MinHash banding + verify
    "ann8_ivfpq_topk",      // IVF+PQ composed ANN
    "cp7_full_curation")    // composed curation pipeline

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(1).getOrElse("2,8,32").split(",").map(_.trim.toInt)
    val queryList = args.lift(2).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(flagships)
    for (n <- cores) {
      val spark = graft.spark.SessionTuning(SparkSession.builder())
        .master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val results = queryList.map { name =>
        val fn = SparkEntry.queries(name)
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Bench.materializedCount(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        name -> runs.tail.min
      }
      val qjson = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",")
      val total = results.map(_._2).sum
      println(f"""{"metric":"speedup","cores":$n,"value":$total%.3f,"unit":"sec","queries":{$qjson},"sf":"$sfDir"}""")
      graft.spark.DfCache.release(spark)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

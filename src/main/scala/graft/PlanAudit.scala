package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Automated plan conformance audit over EVERY gate query: executes
  * each at the given scale factor and asserts the scale-shape
  * invariants on the FINAL adaptive physical plans:
  *
  *   1. no `WindowExec` with an empty partition spec anywhere — an
  *      unpartitioned window moves all rows to one partition, the
  *      scale-killer class eliminated in round 2;
  *   2. cartesian / broadcast-nested-loop joins only in the two
  *      documented exact-baseline queries (dd7 brute-force dedup, ann1
  *      brute-force top-k) whose bucketed scale paths are dd8/ann3/ann4.
  *
  * Exits non-zero on any violation. Usage:
  * runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {

  // dd7/ann1: documented exact baselines (bucketed scale paths are
  // dd8/ann3/ann4). ann3/ann5: the cell-assignment crossJoin broadcasts
  // the CENTROID table — #labels rows for ann3, ceil(sqrt(n)) for ann5 —
  // which is the standard IVF coarse-quantizer shape (every vector must
  // score every centroid), not an unbounded data-data join.
  private val allowedUnbounded =
    Set("dd7_embedding_dups", "ann1_cosine_topk", "ann3_ivf_topk",
        "ann6_sq_topk",
        // ann7: the ADC join keys on the 8 PQ subspaces — the
        // codebook-lookup analogue of ann3's cell join; storage (8
        // code bytes/vector) is where PQ wins, not candidate pruning
        "ann7_pq_topk",
        // ann8 composes ann5's centroid-broadcast assignment with
        // ann7's codebook lookups — same whitelisted shapes
        "ann8_ivfpq_topk",
        "ann5_ivf_scaled")

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    here
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var violations = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan
        val nodes = walk(df.queryExecution.executedPlan)
        val globalWindows = nodes.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        val unbounded = nodes.collect {
          case c: CartesianProductExec => c: SparkPlan
          case b: BroadcastNestedLoopJoinExec => b: SparkPlan
        }
        val problems = Seq(
          if (globalWindows.nonEmpty)
            Some(s"${globalWindows.size} unpartitioned WindowExec") else None,
          if (unbounded.nonEmpty && !allowedUnbounded(name))
            Some(s"${unbounded.size} cartesian/BNLJ node(s)") else None
        ).flatten
        if (problems.isEmpty) println(s"[plan-audit] ok   $name")
        else { violations += problems.size
               println(s"[plan-audit] FAIL $name: ${problems.mkString("; ")}") }
      } catch {
        case e: Throwable =>
          violations += 1
          println(s"[plan-audit] ERR  $name: ${e.getMessage}")
      }
    }
    println(s"[plan-audit] violations=$violations")
    graft.spark.DfCache.release(spark)
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}

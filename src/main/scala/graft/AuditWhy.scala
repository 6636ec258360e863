package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Prints the WindowExec partition specs and BNLJ build sides of one
  * gate's executed plan — for diagnosing PlanAudit decisions.
  * Development tool. Usage: runMain graft.AuditWhy <sfDir> <gate>
  */
object AuditWhy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val gate = args.lift(1).getOrElse("cp7_full_curation")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(gate)(spark, sfDir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    def tree(p: SparkPlan, ind: Int): Unit = {
      println("[tree] " + ("  " * ind) + p.nodeName)
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      kids.foreach(tree(_, ind + 1))
    }
    tree(df.queryExecution.executedPlan, 0)
    walk(df.queryExecution.executedPlan).foreach {
      case w: WindowExec =>
        println(s"[why] WindowExec partitionSpec=${w.partitionSpec.map(_.sql)}" +
          s" order=${w.orderSpec.map(_.sql).take(2)}")
      case b: BroadcastNestedLoopJoinExec if false =>
        println(s"[why] BNLJ buildSide=${b.buildSide}")
        println(b.toString.linesIterator.take(25).mkString("\n"))
      case _ => ()
    }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

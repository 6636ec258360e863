package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the ExprBarrier no-op after the round-15 codegen
  * change (CodegenFallback → child pass-through): the barrier must
  * stay a bit-exact semantic no-op in BOTH execution modes, keep its
  * optimizer-barrier property (the whole point of the wrapper), and
  * actually participate in whole-stage codegen so wrapped hot
  * expressions stop paying interpreted per-row eval. */
class ExprBarrierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  import graft.functions.GeomFunctions.barrier

  /** Range-backed fixture (NOT a local Seq: ConvertToLocalRelation
    * eagerly evaluates projections over LocalRelation driver-side, so
    * a Seq-based frame never exercises codegen or pushdown at all). */
  private def docs = spark.range(4).select(col("id"),
    when(col("id") === 0, lit("a b c a"))
      .when(col("id") === 1, lit("x y"))
      .when(col("id") === 2, lit(""))
      .otherwise(lit(null.asInstanceOf[String])).as("text"))

  test("barrier is a bit-exact no-op under codegen AND interpreted " +
       "projection (arrays, doubles, nulls)") {
    def run(wholeStage: Boolean) = {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage)
      try docs.select(col("id"),
          barrier(split(trim(lower(col("text"))), "\\s+")).as("w"),
          barrier(size(split(col("text"), " ")).cast("double") / 2.0).as("d"))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq
        .sortBy(_._1).map { case (i, w, d) => (i, String.valueOf(w), d) }
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    val plain = docs.select(col("id"),
        split(trim(lower(col("text"))), "\\s+").as("w"),
        (size(split(col("text"), " ")).cast("double") / 2.0).as("d"))
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)), r.get(2)))
      .toSeq.sortBy(_._1)
    assert(run(wholeStage = true) === plain)
    assert(run(wholeStage = false) === plain)
  }

  test("barrier stays non-deterministic: a filter on the barrier'd " +
       "column is NOT pushed below the projection that computes it") {
    val df = docs.select(col("id"), barrier(length(col("text"))).as("n"))
      .filter(col("n") > 2)
    // optimizer must keep Filter ABOVE the Project computing n — i.e.
    // the filter condition references the attribute, never a copy of
    // the length() expression inlined into a scan-level filter
    val optimized = df.queryExecution.optimizedPlan
    val filters = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.nonEmpty)
    assert(filters.forall(!_.condition.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Length])),
      s"length() was duplicated into a filter:\n$optimized")
  }

  test("a projection containing a barrier'd builtin subtree still " +
       "runs inside WholeStageCodegen") {
    val df = docs.filter(col("text").isNotNull)
      .select(col("id"), barrier(md5(col("text"))).as("h"))
    Bench.materializedCount(df) // force execution so AQE finalizes
    val exec = df.queryExecution.executedPlan.toString
    // the codegen'd stage must COVER the project: the '*(n)' prefix on
    // the Project line in the executed plan (the old CodegenFallback
    // barrier dropped the whole projection out of codegen)
    assert(exec.linesIterator.exists(l =>
      l.contains("Project") && l.contains("*(")), exec)
  }

  private def Bench = graft.Bench
}

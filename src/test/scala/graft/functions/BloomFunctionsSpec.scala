package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the bloom-prune predicate: no false negatives ever
  * (pruning must not drop a real match), a bounded false-positive
  * rate at the built fpp, and identical results through the codegen
  * and interpreted evaluation paths.
  */
class BloomFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no false negatives; fpp bounded; codegen == interpreted") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // members: multiples of 7 in [0, 70k); probes: everything in [0, 100k)
    val members = spark.range(0, 70000, 7).toDF("k")
    val bits = BloomFunctions.buildLongFilter(members, "k", 10000, 0.01)

    val probes = spark.range(0, 100000).toDF("k")
    val hit = probes
      .withColumn("m", BloomFunctions.mightContainLong(col("k"), bits))
      .withColumn("member", col("k") % 7 === 0 && col("k") < 70000)

    // every true member must pass the filter
    assert(hit.filter(col("member") && !col("m")).count() === 0L,
      "bloom dropped a true member (false negative)")

    // false-positive rate among non-members stays near the built 1 %
    val nonMembers = hit.filter(!col("member"))
    val fpr = nonMembers.filter(col("m")).count().toDouble / nonMembers.count()
    assert(fpr < 0.03, f"false-positive rate $fpr%.4f far above built 0.01")

    // interpreted path (codegen off) agrees row-for-row
    val interpreted = spark.range(0, 100000).toDF("k")
      .withColumn("m", BloomFunctions.mightContainLong(col("k"), bits))
    withCodegenOff {
      val a = hit.select("k", "m").as[(Long, Boolean)].collect().sortBy(_._1)
      val b = interpreted.select("k", "m").as[(Long, Boolean)].collect().sortBy(_._1)
      assert(a.toSeq == b.toSeq, "codegen and interpreted paths disagree")
    }
  }

  test("null keys stay null-safe (filter drops them, no NPE)") {
    import spark.implicits._
    val members = Seq(1L, 2L, 3L).toDF("k")
    val bits = BloomFunctions.buildLongFilter(members, "k", 3, 0.01)
    val withNulls = Seq(Some(1L), None, Some(99L)).toDF("k")
    val kept = withNulls
      .filter(BloomFunctions.mightContainLong(col("k"), bits))
      .as[Option[Long]].collect().toSeq
    assert(kept == Seq(Some(1L)))
  }

  test("q20: the bloom prunes ~80% of the fact side before its exchange (measured)") {
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.Analytics
      .q20BloomPruneJoin(spark, "/root/testdata/sf0.01")
    // collect() (not count()) so the execution lands on THIS dataset's
    // queryExecution — count() builds a separate agg plan whose metrics
    // this walk would never see
    df.collect()
    // Walk the EXECUTED plan (through AQE wrappers) to the FilterExec
    // holding the bloom predicate and read its real numOutputRows.
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(walk)
    }
    val bloomFilters = walk(df.queryExecution.executedPlan).collect {
      case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no bloom FilterExec in the executed plan")
    // the lineitem-side filter: input 60k rows at sf0.01, ~20% urgent
    // (+ ≤1% false positives) must survive — if the bloom were inert
    // the exchange would see all 60k
    val survived = bloomFilters.map(_.metrics("numOutputRows").value).max
    assert(survived > 5000, s"bloom filter output $survived — gate near-vacuous")
    assert(survived < 18000,
      s"bloom filter passed $survived of 60000 fact rows — pruning lost")
  }

  private def withCodegenOff[T](body: => T): T = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }
}

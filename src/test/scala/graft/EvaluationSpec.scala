package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Evaluation, Progressive, SpatialJoin}

class EvaluationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private def entitiesDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
  }
  private val source = TestGeoms.corpus(seed = 91, n = 100, world = 80)
  private val target = TestGeoms.corpus(seed = 92, n = 80, world = 80)

  test("exhaustive budget reaches full recall; informed weighting " +
       "beats random scheduling on PGR") {
    val full = Evaluation.evaluateProgressive(
      entitiesDf(source), entitiesDf(target), "w_js", budget = 1000000)
    assert(full.recall === 1.0)
    assert(full.qualifying === full.totalQualifying)
    assert(full.pgr > 0 && full.pgr <= 1.0)

    // random baseline: deterministic hash weight, same budget
    val theta = SpatialJoin.computeTheta(entitiesDf(source))
    val randRanked = Progressive.withWeights(
      SpatialJoin.candidatePairs(entitiesDf(source), entitiesDf(target), theta), theta)
      .withColumn("w_rand", Progressive.randomWeight.cast("double"))
      .orderBy(col("w_rand").desc, col("s_id"), col("t_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("w_rand").desc, col("s_id"), col("t_id"))))
      .withColumn("qualifies", graft.functions.GeomFunctions.st_predicate(
        col("s_geom"), col("t_geom"), "intersects"))
    val rand = Evaluation.evaluate(randRanked, full.totalQualifying)
    assert(full.pgr > rand.pgr,
      s"JS weighting (pgr=${full.pgr}) should beat random (pgr=${rand.pgr})")
  }
}

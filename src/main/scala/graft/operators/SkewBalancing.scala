package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeomFunctions._

/** Verification-cost skew handling (reference: DS-JedAI
  * `linkers/loadbalancing/WellBalancedDistributedInterlinking.scala`
  * L1-L2). Spark's AQE skew join only rebalances shuffle BYTES; the
  * expensive resource here is JTS verification time, which scales with
  * geometry size x candidate count. So the cost model stays explicit:
  *
  *   cost(target) = numPoints(target) x |candidates(target)|
  *   skewed      <=> z-score(cost) > zThreshold   (reference: 3)
  *
  * Cheap pairs verify in place (no extra shuffle); skewed pairs are
  * round-robin repartitioned so one hot target's verifications spread
  * across the cluster, then the two branches union. Results are
  * identical to the unbalanced join — only placement changes.
  */
object SkewBalancing {

  /** DE-9IM with cost-balanced verification placement. */
  def balancedDe9im(source: DataFrame, target: DataFrame,
                    zThreshold: Double = 3.0): DataFrame = {
    val theta = SpatialJoin.computeTheta(source)
    val cands = SpatialJoin.candidatePairs(source, target, theta)

    // Per-target verification cost & z-score (two tiny aggregates).
    val costs = cands
      .groupBy(col("t_id"))
      .agg((count(lit(1)) * first(st_numpoints(col("t_geom")))).as("cost"))
    val stats = costs.agg(
      avg(col("cost")).as("mu"), stddev_pop(col("cost")).as("sigma")).head()
    val mu = stats.getDouble(0)
    val sigma = math.max(stats.getDouble(1), 1e-12)

    val skewedIds = costs
      .filter((col("cost") - mu) / sigma > zThreshold)
      .select(col("t_id"))

    val verify = (df: DataFrame) => df
      .withColumn("im", st_im(col("s_geom"), col("t_geom")))
      .select(col("s_id"), col("t_id"), col("im.*"))

    // Broadcast membership split: cheap pairs stay put, skewed pairs
    // spread round-robin across all partitions.
    val cheap  = cands.join(broadcast(skewedIds), Seq("t_id"), "left_anti")
    val skewed = cands.join(broadcast(skewedIds), Seq("t_id"), "left_semi")
      .repartition(cands.sparkSession.sessionState.conf.numShufflePartitions)

    verify(cheap).unionByName(verify(skewed))
  }
}

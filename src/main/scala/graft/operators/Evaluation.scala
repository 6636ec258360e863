package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Progressive-quality evaluation — the reference's metric surface
  * (DS-JedAI `experiments/progressive/ProgressiveEvaluation.scala`,
  * `DistributedProgressiveInterlinking.scala:229-257`):
  *
  *   recall    = qualifying pairs found / total qualifying pairs
  *   precision = qualifying pairs found / verifications spent
  *   PGR       = area under the progressive-recall curve, normalized
  *               so 1.0 means every qualifying pair was found before
  *               any non-qualifying verification.
  */
object Evaluation {

  case class ProgressiveQuality(verifications: Long, qualifying: Long,
                                totalQualifying: Long, recall: Double,
                                precision: Double, pgr: Double)

  /** Evaluate a ranked verification stream (columns: rank, qualifies)
    * against the total qualifying count of the ground truth.
    *
    * DRIVER-SIDE BOUND: the stream is collected, so memory is
    * O(verifications) = O(budget) on the driver — the same bound as
    * the reference's take/takeOrdered evaluation
    * (`DistributedProgressiveInterlinking.scala:188-217`). Fine at
    * evaluation budgets (10⁴-10⁶ rows, two small columns); at the
    * reference's takeBudget extreme (2·10⁷) expect ~hundreds of MB —
    * evaluate on a sampled prefix, or use [[Progressive.pgrCurve]]
    * whose running sum is computed distributed and only 10 checkpoint
    * rows reach the driver. */
  def evaluate(ranked: DataFrame, totalQualifying: Long): ProgressiveQuality = {
    val rows = ranked.select(col("rank"), col("qualifies"))
      .orderBy(col("rank")).collect()
    val verifications = rows.length.toLong
    var cum = 0L; var area = 0.0
    rows.foreach { r =>
      if (r.getBoolean(1)) cum += 1
      area += cum.toDouble
    }
    val qualifying = cum
    // normalize: perfect scheduler finds all qp in the first qp steps
    val perfect = (1L to math.min(qualifying, verifications))
      .map(_.toDouble).sum + math.max(0, verifications - qualifying) * qualifying.toDouble
    ProgressiveQuality(
      verifications, qualifying, totalQualifying,
      recall = if (totalQualifying == 0) 0 else qualifying.toDouble / totalQualifying,
      precision = if (verifications == 0) 0 else qualifying.toDouble / verifications,
      pgr = if (perfect == 0) 0 else area / perfect)
  }

  /** Convenience: evaluate a progressive run of the engine. */
  def evaluateProgressive(source: DataFrame, target: DataFrame, weight: String,
                          budget: Int, relation: String = "intersects"): ProgressiveQuality = {
    val ranked = Progressive.progressiveVerify(source, target, weight, budget, relation)
    val total = SpatialJoin.relate(source, target, relation).count()
    evaluate(ranked, total)
  }
}

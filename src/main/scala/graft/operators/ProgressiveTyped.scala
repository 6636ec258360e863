package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Jts
import graft.model.Relation

/** Candidate pair as carried into the sequential per-partition
  * algorithms: ids, WKB geometry payloads, and the scheduling weight. */
case class CandPair(s_id: String, t_id: String,
                    s_geom: Array[Byte], t_geom: Array[Byte], w: Double)

/** Verified pair emitted by the sequential algorithms, tagged with the
  * in-partition verification order. */
case class VerifiedPair(s_id: String, t_id: String, part: Int,
                        verify_order: Int, qualifies: Boolean)

/** The progressive algorithms with genuine sequential feedback — no
  * declarative form exists, so they run as typed `mapPartitions` over
  * the weighted candidates, one bounded in-memory structure per
  * partition (the reference's execution shape:
  * `linkers/progressive/DynamicProgressiveGIAnt.scala`,
  * `EarlyStoppingLinker.scala`). Candidates stay distributed; only the
  * per-partition priority queue is local, and it is budget-bounded.
  */
object ProgressiveTyped {

  private def weightedCandidates(source: DataFrame, target: DataFrame,
                                 weight: String): Dataset[CandPair] = {
    val theta = SpatialJoin.computeTheta(source)
    val cands = Progressive.withWeights(
      SpatialJoin.candidatePairs(source, target, theta), theta)
    val spark = cands.sparkSession
    import spark.implicits._
    cands.select(col("s_id"), col("t_id"), col("s_geom"), col("t_geom"),
      col(weight).cast("double").as("w")).as[CandPair]
  }

  /** DynamicProgressiveGIAnt (reference
    * `DynamicProgressiveGIAnt.scala:25-88`): drain candidates best-first
    * under a per-partition budget; every time a verified pair
    * qualifies, the weights of queued pairs sharing either entity are
    * boosted by (1 + relatedMatches) and the queue re-orders. Lazy
    * re-insertion keeps the PQ O(log n) amortized. */
  def dynamicProgressive(source: DataFrame, target: DataFrame, weight: String,
                         budget: Int, relation: String): Dataset[VerifiedPair] = {
    val cands = weightedCandidates(source, target, weight)
    val spark = cands.sparkSession
    import spark.implicits._
    val numParts = math.max(1, cands.rdd.getNumPartitions)
    val localBudget = math.max(1, budget / numParts)
    cands.mapPartitions { it =>
      val all = it.toArray
      if (all.isEmpty) Iterator.empty
      else {
        val rel = Relation.of(relation)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val matches = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
        def boosted(c: CandPair): Double =
          c.w * (1 + matches(c.s_id) + matches(c.t_id))
        // max-heap with lazy re-insertion on stale weights
        val pq = new java.util.PriorityQueue[(Double, CandPair)](
          all.length, (a: (Double, CandPair), b: (Double, CandPair)) =>
            java.lang.Double.compare(b._1, a._1))
        all.foreach(c => pq.add((c.w, c)))
        val out = scala.collection.mutable.ArrayBuffer.empty[VerifiedPair]
        var order = 0
        while (order < localBudget && !pq.isEmpty) {
          val (w0, c) = pq.poll()
          val wNow = boosted(c)
          if (wNow > w0) pq.add((wNow, c)) // stale: re-enqueue, don't verify yet
          else {
            val q = rel.eval(Jts.fromWkb(c.s_geom), Jts.fromWkb(c.t_geom))
            out += VerifiedPair(c.s_id, c.t_id, pid, order, q)
            order += 1
            if (q) { matches(c.s_id) += 1; matches(c.t_id) += 1 }
          }
        }
        out.iterator
      }
    }
  }

  /** EarlyStoppingLinker (reference `EarlyStoppingLinker.scala:34-130`):
    * verify the weight-ranked stream in batches; count qualifying pairs
    * per batch; after `maxViolations` consecutive batches yielding
    * fewer than precisionLevel x first-batch matches, stop the
    * partition. */
  def earlyStopping(source: DataFrame, target: DataFrame, weight: String,
                    relation: String, batchSize: Int = 100,
                    precisionLevel: Double = 0.1,
                    maxViolations: Int = 3): Dataset[VerifiedPair] = {
    val cands = weightedCandidates(source, target, weight)
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .sortWithinPartitions(col("w").desc, col("s_id").asc, col("t_id").asc)
      .mapPartitions { it =>
        val rel = Relation.of(relation)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = scala.collection.mutable.ArrayBuffer.empty[VerifiedPair]
        var firstBatchMatches = -1
        var violations = 0
        var order = 0
        var batchMatches = 0
        var stop = false
        while (!stop && it.hasNext) {
          val c = it.next()
          val q = rel.eval(Jts.fromWkb(c.s_geom), Jts.fromWkb(c.t_geom))
          out += VerifiedPair(c.s_id, c.t_id, pid, order, q)
          if (q) batchMatches += 1
          order += 1
          if (order % batchSize == 0) {
            if (firstBatchMatches < 0) firstBatchMatches = batchMatches
            else if (batchMatches < precisionLevel * firstBatchMatches) {
              violations += 1
              if (violations >= maxViolations) stop = true
            } else violations = 0
            batchMatches = 0
          }
        }
        out.iterator
      }
  }
}

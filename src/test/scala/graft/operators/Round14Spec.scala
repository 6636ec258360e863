package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 contracts: the ann21 serving-quality fix (IVF-seeded beam
  * entries + degree-8 graph) and its dominance guarantee. */
class Round14Spec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("ann21 entries: every query enters the graph with exactly 3 " +
       "IVF-probed seeds, deterministically") {
    val a = VectorOps.ann21Entries(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = VectorOps.ann21Entries(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq.sorted === b.toSeq.sorted)
    // exactly 3 entries per query (nprobe=4 cells of a sqrt-n codebook
    // always hold >= 3 non-query members at this sf)
    a.groupBy(_._1).foreach { case (q, es) =>
      assert(es.length === 3, s"query $q entered with ${es.length} seeds")
    }
  }

  test("ann21 beam recall@3 >= ann18 IVF recall@3 (mean over the same " +
       "query sample) — the serving index must not sign off worse " +
       "than the probe path it serves (r13 verdict item 3)") {
    val ivf = VectorOps.ann18RecallEval(spark, dir)
      .agg(avg(col("recall"))).head.getDouble(0)
    val beam = VectorOps.ann21BeamRecall(spark, dir)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(beam >= ivf - 1e-12,
      f"beam recall $beam%.3f fell below IVF recall $ivf%.3f")
  }
}

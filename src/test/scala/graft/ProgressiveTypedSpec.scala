package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ProgressiveTyped, SpatialJoin, Progressive}

class ProgressiveTypedSpec extends AnyFunSuite {
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

  private val source = TestGeoms.corpus(seed = 5, n = 80, world = 60)
  private val target = TestGeoms.corpus(seed = 9, n = 60, world = 60)

  private def allCandidatePairs(): Set[(String, String)] = {
    val src = entitiesDf(source); val tgt = entitiesDf(target)
    SpatialJoin.candidatePairs(src, tgt, SpatialJoin.computeTheta(src))
      .select("s_id", "t_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("dynamic progressive with exhaustive budget finds the same " +
       "qualifying set as the batch join") {
    val got = ProgressiveTyped.dynamicProgressive(
      entitiesDf(source), entitiesDf(target), "w_js",
      budget = 1000000, relation = "intersects")
      .collect()
    val qualifying = got.filter(_.qualifies).map(p => (p.s_id, p.t_id)).toSet
    val expected = SpatialJoin.relate(entitiesDf(source), entitiesDf(target),
      "intersects").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(qualifying === expected)
    // every candidate verified exactly once
    assert(got.length === allCandidatePairs().size)
    assert(got.map(p => (p.s_id, p.t_id)).distinct.length === got.length)
  }

  test("dynamic progressive spends the budget exactly when candidates " +
       "are plentiful") {
    val budget = 10
    val got = ProgressiveTyped.dynamicProgressive(
      entitiesDf(source), entitiesDf(target), "w_js",
      budget = budget, relation = "intersects").collect()
    // proration sums to min(budget, total candidates); this corpus has
    // far more candidates than 10
    assert(got.length === budget)
  }

  test("budget proration: largest-remainder, capped by counts, sums to " +
       "min(budget, total)") {
    // 90/10 split of a 10-pair budget → 9/1
    assert(ProgressiveTyped.prorate(Map(0 -> 90L, 1 -> 10L), 10)
      === Map(0 -> 9, 1 -> 1))
    // remainders go to the largest fractional share (pid tie-break)
    val p = ProgressiveTyped.prorate(Map(0 -> 1L, 1 -> 1L, 2 -> 1L), 2)
    assert(p.values.sum === 2 && p.values.forall(_ <= 1))
    // budget above total: every partition gets exactly its count
    assert(ProgressiveTyped.prorate(Map(0 -> 3L, 1 -> 5L), 100)
      === Map(0 -> 3, 1 -> 5))
    // empty input
    assert(ProgressiveTyped.prorate(Map.empty, 10) === Map.empty)
    // a zero-candidate partition never gets budget
    assert(ProgressiveTyped.prorate(Map(0 -> 0L, 1 -> 4L), 2)
      === Map(0 -> 0, 1 -> 2))
  }

  test("dense partitions get proportionally more budget than sparse ones") {
    val p = ProgressiveTyped.prorate(Map(0 -> 1000L, 1 -> 10L, 2 -> 10L), 51)
    assert(p(0) === 50 && p(1) + p(2) === 1)
  }

  test("dynamic boosting verifies neighbours of matches earlier than " +
       "static order when boosts fire") {
    // With a never-qualifying relation, no boosts fire: verification
    // order within each partition must be exactly weight-descending.
    val got = ProgressiveTyped.dynamicProgressive(
      entitiesDf(source), entitiesDf(target), "w_js",
      budget = 1000000, relation = "equals").collect()
    assert(got.count(_.qualifies) === 0)
    val src = entitiesDf(source); val tgt = entitiesDf(target)
    val theta = SpatialJoin.computeTheta(src)
    val weights = Progressive.withWeights(
      SpatialJoin.candidatePairs(src, tgt, theta), theta)
      .select("s_id", "t_id", "w_js").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    got.groupBy(_.part).values.foreach { part =>
      val inOrder = part.sortBy(_.verify_order).map(p => weights((p.s_id, p.t_id)))
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a >= b },
        "verification order must be weight-descending when no boosts fire")
    }
  }

  private def weightMap(cols: String*): Map[(String, String), Seq[Double]] = {
    val src = entitiesDf(source); val tgt = entitiesDf(target)
    val theta = SpatialJoin.computeTheta(src)
    Progressive.withWeights(SpatialJoin.candidatePairs(src, tgt, theta), theta)
      .select(col("s_id") +: col("t_id") +: cols.map(c => col(c).cast("double")): _*)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        cols.indices.map(i => r.getDouble(2 + i)))
      .toMap
  }

  private def assertLexicographicOrder(
      parts: Iterable[Seq[Seq[Double]]], what: String): Unit =
    parts.foreach { inOrder =>
      inOrder.zip(inOrder.tail).foreach { case (a, b) =>
        val cmp = a.zip(b).collectFirst { case (x, y) if x != y => x > y }
        assert(cmp.getOrElse(true), s"$what: $a must sort before $b")
      }
    }

  test("COMPOSITE scheme orders by main weight with secondary tie-break " +
       "(reference CompositeWP ordering)") {
    // never-qualifying relation → no boosts → order is the pure ordering
    val got = ProgressiveTyped.dynamicProgressive(
      entitiesDf(source), entitiesDf(target), "w_js",
      budget = 1000000, relation = "equals",
      scheme = "COMPOSITE", secondary = "w_cf").collect()
    val ws = weightMap("w_js", "w_cf")
    assertLexicographicOrder(
      got.groupBy(_.part).values.map(_.sortBy(_.verify_order)
        .map(p => ws((p.s_id, p.t_id))).toSeq),
      "COMPOSITE (w_js, w_cf)")
  }

  test("HYBRID scheme orders by the weight product " +
       "(reference HybridWP ordering)") {
    val got = ProgressiveTyped.dynamicProgressive(
      entitiesDf(source), entitiesDf(target), "w_js",
      budget = 1000000, relation = "equals",
      scheme = "HYBRID", secondary = "w_mbro").collect()
    val ws = weightMap("w_js", "w_mbro")
    assertLexicographicOrder(
      got.groupBy(_.part).values.map(_.sortBy(_.verify_order)
        .map(p => Seq(ws((p.s_id, p.t_id)).product)).toSeq),
      "HYBRID (w_js * w_mbro)")
  }

  test("early stopping verifies in THIN_MULTI_COMPOSITE order " +
       "(JS, CF, MBRO lexicographic — reference EarlyStoppingLinker)") {
    val got = ProgressiveTyped.earlyStopping(
      entitiesDf(source), entitiesDf(target), "w_js",
      relation = "intersects", batchSize = 10,
      precisionLevel = 0.0, maxViolations = 1).collect()
    val ws = weightMap("w_js", "w_cf", "w_mbro")
    assertLexicographicOrder(
      got.groupBy(_.part).values.map(_.sortBy(_.verify_order)
        .map(p => ws((p.s_id, p.t_id))).toSeq),
      "THIN_MULTI_COMPOSITE (w_js, w_cf, w_mbro)")
  }

  test("early stopping accepts a non-default main weight (two remaining " +
       "lexicographic levels pad to three)") {
    val got = ProgressiveTyped.earlyStopping(
      entitiesDf(source), entitiesDf(target), "w_cf",
      relation = "intersects", batchSize = 10,
      precisionLevel = 0.0, maxViolations = 1).collect()
    assert(got.length === allCandidatePairs().size)
  }

  test("early stopping verifies everything when precision level is zero") {
    val got = ProgressiveTyped.earlyStopping(
      entitiesDf(source), entitiesDf(target), "w_js",
      relation = "intersects", batchSize = 10,
      precisionLevel = 0.0, maxViolations = 1).collect()
    assert(got.length === allCandidatePairs().size)
  }

  test("early stopping stops early on a decaying match stream") {
    val got = ProgressiveTyped.earlyStopping(
      entitiesDf(source), entitiesDf(target), "w_js",
      relation = "intersects", batchSize = 5,
      precisionLevel = 1.5, maxViolations = 1).collect()
    // precision bar above 1x first batch: every batch after the first
    // violates, each partition stops after its second batch.
    val total = allCandidatePairs().size
    assert(got.length < total, s"expected early stop, verified all $total")
  }
}

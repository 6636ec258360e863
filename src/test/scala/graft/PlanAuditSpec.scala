package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape conformance as a CI gate: runs [[PlanAudit.auditAll]]
  * over every gate query at sf0.001, so a regression that introduces
  * an unpartitioned window, an unwhitelisted cartesian, a shuffle
  * directly on a parquet scan (q*), or an aggregate on the ADC
  * candidate path (ann7/ann8) fails `sbt test` — not just the driver
  * round.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every gate query's final adaptive plan passes the conformance audit") {
    spark.sparkContext.setLogLevel("ERROR")
    val bad = PlanAudit.auditAll(spark, "/root/testdata/sf0.001")
      .filter(_._2.nonEmpty)
    assert(bad.isEmpty, bad.map { case (n, ps) =>
      s"$n: ${ps.mkString("; ")}" }.mkString("\n"))
  }

  test("rule 6: healthy partitioned reads pass; the conjunct classifier " +
       "separates prunable from mixed predicates") {
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a genuinely partitioned table: pruning must land in
    // partitionFilters and rule 6 must stay silent
    val dir = java.nio.file.Files.createTempDirectory("graft_part_audit").toString
    (0 until 1000).map(i => (i.toLong, i % 5, s"v$i"))
      .toDF("id", "p", "v")
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("p") === 3 && col("id") > 10)
    pruned.collect()
    assert(PlanAudit.auditPlan("partitioned_read", pruned).isEmpty,
      "healthy pruned read must not be flagged")
    // mixed disjunction (partition OR data column) legitimately cannot
    // prune — rule 6 must NOT flag it as lost pruning
    val mixed = spark.read.parquet(dir).filter(col("p") === 3 || col("id") > 990)
    mixed.collect()
    assert(PlanAudit.auditPlan("mixed_read", mixed)
      .forall(!_.contains("partition pruning")),
      "mixed partition/data disjunction must not count as lost pruning")
    // classifier unit contract: exactly the partition-only
    // deterministic conjuncts are extracted (what FileSourceStrategy
    // moves into partitionFilters)
    val pAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "p", org.apache.spark.sql.types.IntegerType)()
    val idAttr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "id", org.apache.spark.sql.types.LongType)()
    import org.apache.spark.sql.catalyst.expressions.{And, Or, EqualTo, GreaterThan, Literal}
    val partOnly = EqualTo(pAttr, Literal(3))
    val dataOnly = GreaterThan(idAttr, Literal(10L))
    assert(PlanAudit.partitionOnlyConjuncts(
      And(partOnly, dataOnly), Set("p")) == Seq(partOnly))
    assert(PlanAudit.partitionOnlyConjuncts(
      Or(partOnly, dataOnly), Set("p")).isEmpty,
      "a mixed disjunction is one conjunct referencing a data column")
    assert(PlanAudit.partitionOnlyConjuncts(
      partOnly, Set.empty) == Seq.empty)
  }

  test("rule 7: a superset-key local window does NOT excuse a low-NDV " +
       "window unless a rank filter sits between the stages") {
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val df = (0 until 400)
      .map(i => (s"src${i % 3}", i.toLong, (i * 7 % 100).toLong))
      .toDF("source", "doc_id", "n")
    val local = Window.partitionBy(col("source"), col("doc_id") % 8)
      .orderBy(col("n").desc)
    val global = Window.partitionBy(col("source")).orderBy(col("n").desc)
    // filterless funnel: the local stage exists but its rank never caps
    // the global stage's input — the exact shape rule 7 must flag
    val funnel = df.withColumn("lrk", row_number().over(local))
      .withColumn("grk", row_number().over(global))
    funnel.collect()
    assert(PlanAudit.auditPlan("filterless_funnel", funnel)
      .exists(_.contains("low-NDV")),
      "un-capped low-NDV window must be flagged despite the local stage")
    // the genuine decomposition (rank cap between stages) passes
    val capped = df.withColumn("lrk", row_number().over(local))
      .filter(col("lrk") <= 5)
      .withColumn("grk", row_number().over(global))
    capped.collect()
    assert(!PlanAudit.auditPlan("capped_decomposition", capped)
      .exists(_.contains("low-NDV")),
      "shard-local -> filter -> global decomposition must pass")
  }
}

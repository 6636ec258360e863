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
}

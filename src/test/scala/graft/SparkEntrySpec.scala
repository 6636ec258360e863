package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every oracle belongs to a registered
  * query, names are unique across modules, and the flagship entry
  * returns rows at smoke scale.
  */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  test("every oracle key names a registered query") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without queries: $stray")
  }

  test("module query registries do not shadow each other") {
    val all = Seq(
      graft.operators.Analytics.queries, graft.operators.GeoQueries.queries,
      graft.operators.ProgressiveQueries.queries, graft.operators.TextOps.queries,
      graft.operators.VectorOps.queries, graft.operators.Multimodal.queries,
      graft.operators.EventOps.queries, graft.operators.GraphOps.queries,
      // the streaming gates register directly in SparkEntry (st1/st2)
      SparkEntry.queries.view.filterKeys(_.startsWith("st")).toMap)
    val names = all.flatMap(_.keys)
    assert(names.length === names.distinct.length,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.size === names.length)
  }

  test("flagship entry returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The registry-shrinkage guard (round-6 verdict item 3): every name
  * in `SparkEntry.queries` must ANALYZE successfully against the
  * sf0.001 testdata — `df.queryExecution.analyzed` resolves the full
  * plan against the real on-disk schemas without executing a job, so
  * a schema drift in the driver's parquet (the r5/r6 events
  * timestamp[us] change) fails `sbt test` immediately and by name,
  * instead of silently dropping rows from the driver's CORRECTNESS
  * artifact.
  *
  * The two streaming gates execute a bounded replay inside their
  * registry function (they cannot be analyzed without running); they
  * are covered by EventStreamSpec and PlanAuditSpec, so this spec
  * checks their UNDERLYING plans analyze instead: the batch `events`
  * read they replay and the streaming readEvents plan.
  */
class RegistryAnalyzeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
  private val executesOnBuild =
    Set("st1_stream_sessionize", "st2_stream_interval_join",
        "st3_stream_hourly", "st4_stream_dedupe")

  test("every registered gate query analyzes against the sf0.001 schemas") {
    spark.sparkContext.setLogLevel("ERROR")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => executesOnBuild(name) }
      .flatMap { case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the streaming gates' underlying event plans analyze") {
    spark.sparkContext.setLogLevel("ERROR")
    // batch side both gates replay
    Tables.events(spark, sfDir).queryExecution.analyzed
    // streaming production path (schema-adaptive readEvents)
    val stream = graft.streaming.EventStream.readEvents(spark, sfDir)
    graft.streaming.EventStream.hourlyAgg(stream).queryExecution.analyzed
    graft.streaming.EventStream.sessionize(stream).queryExecution.analyzed
  }

  test("every registered query has an oracle (full-strength gate)") {
    // Since round 9 the sketch family (q17/q18/q19/st5/st6) is
    // hash-exact too — the gate payload is the DuckDB-computable exact
    // value plus a within_bounds boolean carrying the sketch contract
    // — so there is NO rows-only whitelist anymore: every registered
    // query must carry an oracle.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracleSql: $noOracle")
  }
}

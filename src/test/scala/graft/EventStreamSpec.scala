package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Batch/stream parity: the streaming hourly aggregation over static
  * parquet must produce exactly the batch result.
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  test("streaming hourly aggregation matches the batch query") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStream.runToMemory(spark, dir, "hourly_test")
    try {
      val streamed = spark.table("hourly_test")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = graft.Tables.events(spark, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-streaming surface over the `events` table shape —
  * beyond the reference (DS-JedAI is batch-only, SURVEY §2.10); a
  * modern engine needs the streaming path for continuous ingestion.
  * The same hourly aggregation as the batch q6 query, expressed as
  * readStream → watermark → windowed agg, so batch/stream parity is
  * testable by pointing the stream at static parquet.
  */
object EventStream {

  /** events schema as stored (ts is TIMESTAMP(NANOS) → read as long). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The streaming file source needs a directory; events.parquet is a
    // single file, so stream the parent dir with a glob filter.
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Hourly per-type aggregation with a late-data watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 2).as("sum_value"))
      .select(col("event_type"), col("window.start").as("hour"),
        col("n_events"), col("sum_value"))

  /** Run the hourly aggregation over static parquet via the streaming
    * engine into an in-memory sink; returns the finished query. */
  def runToMemory(spark: SparkSession, dir: String, name: String): StreamingQuery = {
    val q = hourlyAgg(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver-provided parquet test data
  * (see TESTDATA.md). Every query takes the scale-factor directory as a
  * parameter so the same code runs at sf0.001 (smoke), sf0.01
  * (correctness) and sf0.1+ (bench). At cluster scale these paths would
  * be object-store prefixes; nothing here assumes local FS.
  */
object Tables {
  // NOTE (round 15): a blanket repartition-after-read was measured here
  // and REVERTED — it wins only where per-row map work dominates the
  // scan (dd7's brute cosine arm: 2.43 s → 0.71 s) and loses where the
  // first operation is an aggregation (q1: 0.46 s → 1.02 s — the
  // round-robin exchange costs more than the serial partial agg it
  // parallelizes). The spread is applied site-selectively instead
  // ([[graft.spark.Spread]]): the brute-force vector arms and the
  // spatial verification path, never agg-first scans.
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (Spark refuses by default →
    * read as nanos long) and parquet timestamp[us] with
    * isAdjustedToUTC=false (Spark infers TIMESTAMP_NTZ). Read
    * schema-adaptively so both land on the same logical column: a
    * session-independent UTC TIMESTAMP in microseconds. NTZ inference
    * is disabled so the stored micros scan directly as UTC-epoch
    * TIMESTAMP values regardless of session timezone. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Normalize whatever physical `ts` the scan produced to a UTC
    * microsecond TIMESTAMP (shared by the batch reader above and the
    * streaming reader in [[graft.streaming.EventStream]]). */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // legacy TIMESTAMP(NANOS) scanned as long via nanosAsLong
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // NTZ fallback (inference conf not honored): all graft entry
      // points run session timeZone = UTC, so the cast is the identity
      // reinterpretation of the stored wall-clock as a UTC instant
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver-provided parquet test data
  * (see TESTDATA.md). Every query takes the scale-factor directory as a
  * parameter so the same code runs at sf0.001 (smoke), sf0.01
  * (correctness) and sf0.1+ (bench). At cluster scale these paths would
  * be object-store prefixes; nothing here assumes local FS.
  */
object Tables {
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

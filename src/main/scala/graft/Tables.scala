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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark refuses by
    * default; read it as a nanos long and surface a microsecond
    * timestamp column of the same name. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

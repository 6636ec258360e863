package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events reader must survive the driver's parquet generator
  * changing `ts`'s physical type (it flipped TIMESTAMP(NANOS) →
  * timestamp[us] between rounds 4 and 5, silently breaking 7 queries).
  * This spec writes the SAME logical rows in both physical forms and
  * asserts [[Tables.events]]'s normalization lands on identical UTC
  * microsecond instants either way, and that the streaming reader's
  * derived schema matches the batch one.
  */
class EventsSchemaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeDir(suffix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"events_$suffix").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** The driver testdata stores events as a SINGLE parquet file named
    * events.parquet (the streaming reader's glob relies on it); Spark
    * writes a directory, so relocate the lone part file. */
  private def writeSingleFile(df: DataFrame, dir: String): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/_tmp")
    val part = new java.io.File(s"$dir/_tmp").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail("no part file written"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    new java.io.File(s"$dir/_tmp").listFiles().foreach(_.delete())
    new java.io.File(s"$dir/_tmp").delete()
  }

  /** Write the rows as parquet with `ts` annotated TIMESTAMP(NANOS,
    * isAdjustedToUTC=false) — the physical form the driver's generator
    * shipped before round 5. Uses parquet-java's example writer (on the
    * Spark classpath) since Spark itself never writes NANOS. */
  private def writeNanosFile(path: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
      .withConf(conf).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = gf.newGroup()
      g.add("event_id", r._1)
      g.add("ts", r._2 * 1000L) // nanoseconds
      g.add("user_id", r._3)
      g.add("event_type", r._4)
      g.add("value", r._5)
      g.add("props", r._6)
      writer.write(g)
    } finally writer.close()
  }

  /** Rows with known microsecond instants (all past epoch 0 — the
    * streaming watermark gotcha). */
  private val baseUs = 1700000000000000L // 2023-11-14T22:13:20Z
  private def rows = (1L to 50L).map { i =>
    (i, baseUs + i * 1234567L, i % 7, if (i % 2 == 0) "click" else "error",
      i * 0.5, s"""{"k":$i}""")
  }

  test("nanos-long and timestamp[us] physical forms normalize identically") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // form A: timestamp[us] (current testdata) — written as TIMESTAMP_NTZ
    // so the file carries isAdjustedToUTC=false like the driver's pandas
    val dirA = writeDir("us")
    writeSingleFile(
      rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props"),
      dirA)
    // form B: a GENUINE parquet TIMESTAMP(NANOS, isAdjustedToUTC=false)
    // column (the old testdata's physical type), written via parquet-java
    // directly because Spark can't produce that annotation itself. This
    // exercises the real legacy read path end to end: the nanosAsLong
    // scan of an annotated INT64, not merely a raw long that happens to
    // hold nanos (round-7 advisory).
    val dirB = writeDir("nanos")
    writeNanosFile(s"$dirB/events.parquet")

    def normalized(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq

    val a = normalized(dirA)
    val b = normalized(dirB)
    assert(a == b, "the two physical forms disagree after normalization")
    assert(a.map(_._2) == rows.map(_._2), "normalized micros != source micros")
    // both normalize to a session-independent TIMESTAMP column
    Seq(dirA, dirB).foreach { d =>
      assert(Tables.events(spark, d).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
    }
  }

  test("streaming reader derives its schema from the file and agrees with batch") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = writeDir("stream")
    import spark.implicits._
    writeSingleFile(
      rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props"),
      dir)
    val stream = graft.streaming.EventStream.readEvents(spark, dir)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val name = "events_schema_gate"
    val q = stream.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == rows.map(r => (r._1, r._2)),
      "streamed instants differ from source micros")
  }
}

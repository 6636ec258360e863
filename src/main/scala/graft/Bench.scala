package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every gate query at the
  * given scale factor and prints ONE JSON line with per-query seconds.
  *
  * Methodology: queries run in sorted-name order (Map iteration order
  * changes whenever a key is added, which would silently reassign the
  * first-query position across rounds), and the session-shared entity
  * caches ([[graft.spark.DfCache]]: WKT parse + persist of the derived
  * geometry corpora) are materialized in an UNTIMED warmup, mirroring
  * the reference experiments which persist sources before timing the
  * linkers (DS-JedAI `experiments/GiantExp.scala:71-79`). The warmup
  * cost is reported separately as `warmup_sec`, so nothing is hidden —
  * per-query numbers then measure the query, not whichever one ran
  * first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Same session timezone as Verify/Scale/PlanAudit: hour bucketing
      // (q6/q16/st3) and the TIMESTAMP_NTZ normalization cast in
      // Tables.normalizeEventTs are session-timezone sensitive, so a
      // non-UTC host would otherwise bench different plans/rows than
      // the ones the gates verified.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scan warmup so the first measured query isn't
    // charged ~5s of session startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    // Materialize the session-shared entity caches (untimed, reported).
    val w0 = System.nanoTime()
    try {
      graft.operators.GeoQueries.partBoxes(spark, sfDir).count()
      graft.operators.GeoQueries.supplierBoxes(spark, sfDir).count()
      graft.operators.GeoQueries.customerPoints(spark, sfDir).count()
      graft.operators.GeoQueries.customerTriangles(spark, sfDir).count()
      graft.operators.GeoQueries.orderSegments(spark, sfDir).count()
      graft.operators.GeoQueries.mixedCorpus(spark, sfDir).count()
    } catch { case _: Throwable => }
    val warmup = (System.nanoTime() - w0) / 1e9
    // Min of two runs per query: a single GC/IO stall otherwise lands on
    // whichever query happens to be running and can blow the whole-suite
    // comparison by itself (a 0.6 MB groupBy was once charged 58 s by one
    // such stall). The min is the steady-state cost of the PLAN — the
    // thing a cross-round comparison is meant to measure.
    // A throwing query must NOT record its time-to-exception as a
    // plausible runtime (that masked the r5/r6 events breakage for two
    // rounds): failures report a -1 sentinel time plus the exception
    // in an `errors` map, and `failed` makes the count impossible to
    // miss in the one-line artifact.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
        (System.nanoTime() - t0) / 1e9
      }
      (name, if (err.isDefined) -1.0 else runs.min, err, runs)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // Failed queries are named in `errors` only — including a -1
    // sentinel here would make a consumer's sum over `queries`
    // disagree with `value` (round-7 advisory).
    val qs = results.collect { case (k, v, None, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val failed = results.count(_._3.isDefined)
    // the st* gates are bounded replay/real-source streaming harnesses
    // whose cost is micro-batch machinery, not plan steady-state —
    // split them out so cross-round comparisons of the batch core are
    // not muddied by streaming-gate count changes
    val streamSec = ok.filter(_._1.startsWith("st")).map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","warmup_sec":$warmup,"batch_sec":${total - streamSec},"stream_sec":$streamSec,"failed":$failed,"errors":$errs,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // The driver's artifact capture has truncated the stdout tail in
    // past rounds (BENCH_r07 carried only the last ~58 of 91 queries) —
    // persist the full line, PLUS both raw per-query runs so
    // cross-round readers can judge noise (min-of-2 is what the
    // headline uses; the raw pair shows when the two disagree).
    val rawRuns = results.map { case (k, _, _, rs) =>
      s"${jstr(k)}:[${rs.map(t => f"$t%.3f").mkString(",")}]"
    }.mkString("{", ",", "}")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_local.json"),
      line.dropRight(1) + s""","runs":$rawRuns}""" + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist BENCH_local.json: $e") }
    graft.spark.DfCache.release(spark)
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.util.AffineTransformation

/** Scale-up corpus builders for the measured scaling experiment
  * (SCALING.md): grow a base corpus N× while keeping its LOCAL
  * structure — so per-row work is representative and the true result
  * grows linearly, never quadratically in N.
  *
  *  - GEOMETRY: copy 0 is the original; copies 1..N-1 are
  *    [[Jitter]]-perturbed (S10 semantics, deterministic seeds) and
  *    then TRANSLATED onto a disjoint domain-grid cell. The reference's
  *    jitter alone leaves copies stacked on the originals, which
  *    multiplies pair density by N (candidate work n·N², a different
  *    experiment); spreading copies keeps density constant — N× rows,
  *    N× area, ≈N× join output, which is what "the same workload at N×
  *    the data" means.
  *  - TEXT: copy k suffixes every whitespace token with `~k`, so
  *    within-copy shingle/Jaccard/MinHash/SimHash structure is
  *    preserved EXACTLY (dedup output scales by N) while cross-copy
  *    shingle overlap is zero (no N² near-dup flood).
  *  - EMBEDDINGS: copy k applies a per-copy random coordinate
  *    permutation + sign mask (seeded from (seed, k)). Within-copy
  *    cosines are preserved exactly — sign_i² = 1 cancels — so the
  *    near-dup tail scales by N; cross-copy cosines are
  *    random-projection small (≪ the 0.45 near-dup threshold), and
  *    coordinate marginals (norms, codebook geometry) are unchanged.
  */
object ScaleCorpus {

  /** Envelope of EVERYTHING the jitter can produce from a corpus whose
    * union MBR is (minx,miny,maxx,maxy): translate modes move ±1.5,
    * scale mode multiplies a coordinate by [0.5, 1.5). */
  private def jitterReach(lo: Double, hi: Double): (Double, Double) = (
    math.min(math.min(0.5 * lo, 1.5 * lo), lo) - 1.5,
    math.max(math.max(0.5 * hi, 1.5 * hi), hi) + 1.5)

  /** N× entity corpus as (id, wkt): original + (N-1) jittered copies,
    * copy k translated to domain-grid cell k. The grid step covers the
    * full jitter REACH (scale mode can multiply a coordinate by 1.5),
    * so copies are disjoint by construction — constant pair density,
    * not the stacked-copies N² of raw jitter.
    *
    * `domain`: union MBR (minx,miny,maxx,maxy) shared by ALL corpora
    * participating in one join experiment — each corpus translated on
    * its own bounds would land copy k of source and target in
    * DIFFERENT places, creating spurious cross-copy pairs. Defaults to
    * this corpus's own bounds (single-corpus use).
    *
    * A jittered copy that comes out invalid (the ×-scale mode can
    * bow-tie a small ring; the S6 validity filter would drop it and
    * silently shrink the corpus) retries with a re-derived seed —
    * deterministic, and the N× corpus stays exactly N×. */
  def scaledWkt(entities: DataFrame, n: Int, seed: Long = 42L,
                domain: Option[(Double, Double, Double, Double)] = None)
      : DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    require(n >= 1, s"scale factor must be >= 1, got $n")
    val (bx0, by0, bx1, by1) = domain.getOrElse {
      val b = entities.agg(min("minx"), min("miny"), max("maxx"), max("maxy")).head
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    }
    val (rx0, rx1) = jitterReach(bx0, bx1)
    val (ry0, ry1) = jitterReach(by0, by1)
    val (stepX, stepY) = ((rx1 - rx0) * 1.02 + 3.0, (ry1 - ry0) * 1.02 + 3.0)
    val grid = math.ceil(math.sqrt(n.toDouble)).toInt
    entities.select(col("id").cast("string"), col("geom"))
      .as[(String, Array[Byte])]
      .flatMap { case (id, wkb) =>
        val g = graft.functions.Jts.fromWkb(wkb)
        (0 until n).map { k =>
          if (k == 0) (id, g.toText)
          else {
            var jit = Jitter.transform(g,
              new scala.util.Random(Jitter.rowSeed(seed, k, id)),
              translateOnly = true)
            var retry = 0
            while (!jit.isValid && retry < 8) {
              retry += 1
              jit = Jitter.transform(g, new scala.util.Random(
                Jitter.rowSeed(seed + 7919L * retry, k, id)),
                translateOnly = true)
            }
            val tr = AffineTransformation.translationInstance(
              (k % grid) * stepX, (k / grid) * stepY)
            (s"$id~$k", tr.transform(if (jit.isValid) jit else g).toText)
          }
        }
      }
      .toDF("id", "wkt")
  }

  /** N× documents table (same schema as the base parquet): copy k gets
    * doc_id + k·step and every token suffixed `~k`; n_chars follows
    * the rewritten text. */
  def scaledDocuments(spark: SparkSession, baseDir: String, n: Int): DataFrame = {
    val base = graft.Tables.documents(spark, baseDir)
    val step = base.agg(max("doc_id")).head.getLong(0) + 1L
    val ks = broadcast(spark.range(0, n).select(col("id").cast("int").as("k")))
    base.crossJoin(ks)
      .withColumn("text2", when(col("k") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1~"), col("k")))))
      .select(
        (col("doc_id") + col("k") * step).as("doc_id"),
        col("text2").as("text"),
        col("lang"), col("source"),
        length(col("text2")).as("n_chars"))
  }

  /** N× embeddings table: copy k gets vec_id + k·step and the
    * permutation+sign transform described above; labels carry over. */
  def scaledEmbeddings(spark: SparkSession, baseDir: String, n: Int,
                       seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val base = graft.Tables.embeddings(spark, baseDir)
    val step = base.agg(max("vec_id")).head.getLong(0) + 1L
    val dims = base.select(size(col("embedding"))).head.getInt(0)
    // per-copy permutation + sign mask, deterministic from (seed, k, i)
    def fold(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 0, 8).getLong ^
        java.nio.ByteBuffer.wrap(d, 8, 8).getLong
    }
    val transforms: Array[(Array[Int], Array[Int])] = Array.tabulate(n) { k =>
      if (k == 0) (Array.tabulate(dims)(identity), Array.fill(dims)(1))
      else ((0 until dims).sortBy(i => fold(s"p:$seed:$k:$i")).toArray,
            Array.tabulate(dims)(i => if (fold(s"s:$seed:$k:$i") >= 0) 1 else -1))
    }
    base.select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Array[Float], Int)]
      .flatMap { case (id, v, label) =>
        (0 until n).map { k =>
          val (perm, sign) = transforms(k)
          (id + k * step, Array.tabulate(v.length)(i => sign(i) * v(perm(i))), label)
        }
      }
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
  }

  /** N× symmetric edge frame (src, dst): copy k shifts BOTH endpoints
    * by k·step with step forced EVEN, so id-parity node namespacing
    * (customer = even, supplier = odd) survives scaling. Copies are
    * disjoint — iterative propagation cost grows with edge volume while
    * each copy's trajectory stays structurally identical to the base
    * graph's. */
  def scaledEdges(spark: SparkSession, edges: DataFrame, n: Int): DataFrame =
    if (n == 1) edges
    else {
      val mx = edges.agg(max(greatest(col("src"), col("dst")))).head.getLong(0)
      val step = (mx / 2 + 1) * 2
      val ks = broadcast(spark.range(0, n).select(col("id").as("k")))
      edges.crossJoin(ks).select(
        (col("src") + col("k") * step).as("src"),
        (col("dst") + col("k") * step).as("dst"))
    }

  /** N× events table: copy k shifts event_id and user_id by k·step
    * (so the ACTIVE-USER population grows N× — the sessionizer's
    * state-size driver) while ts is carried unchanged (same 30-day
    * span at N× the event RATE — the interval join's state-size
    * driver). Within-copy per-user event sequences are preserved
    * exactly, so sessions and join pairs scale by N with zero
    * cross-copy interaction (ids are disjoint). */
  def scaledEvents(spark: SparkSession, baseDir: String, n: Int): DataFrame = {
    val base = graft.Tables.events(spark, baseDir)
    val eStep = base.agg(max("event_id")).head.getLong(0) + 1L
    val uStep = base.agg(max("user_id")).head.getLong(0) + 1L
    val ks = broadcast(spark.range(0, n).select(col("id").as("k")))
    base.crossJoin(ks)
      .select(
        (col("event_id") + col("k") * eStep).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * uStep).as("user_id"),
        col("event_type"), col("value"), col("props"))
  }

  /** Materialize an N× text+embedding+events data dir
    * (documents.parquet, embeddings.parquet, events.parquet)
    * compatible with `graft.Tables`; skips work if the dir already
    * exists. Events are written SORTED by ts within each of the part
    * files so the streaming file source's per-file micro-batches see
    * broadly time-ordered input (the shape a real ingestion log has);
    * ranged repartition keeps files time-disjoint. Returns the dir. */
  def ensureScaledDir(spark: SparkSession, baseDir: String, n: Int,
                      outBase: String): String = {
    val out = s"$outBase/${new java.io.File(baseDir).getName}x$n"
    val done = new java.io.File(s"$out/_done")
    if (!done.exists()) {
      scaledDocuments(spark, baseDir, n)
        .repartition(math.min(32, n * 4))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      scaledEmbeddings(spark, baseDir, n)
        .repartition(math.min(32, n * 4))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    // events got their own marker in round 8 so dirs materialized by
    // earlier rounds upgrade in place without rebuilding text corpora
    val doneEvents = new java.io.File(s"$out/_done_events")
    if (!doneEvents.exists()) {
      scaledEvents(spark, baseDir, n)
        .repartitionByRange(math.min(32, n * 4), col("ts"), col("event_id"))
        .sortWithinPartitions(col("ts"), col("event_id"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      // The streaming file source replays files in MODIFICATION-TIME
      // order; tasks commit in arbitrary order, so restamp the part
      // files ascending in path (= ts-range) order — otherwise a
      // late-range file processed first advances the watermark past
      // the earlier ranges and the stateful operators drop them.
      val parts = Option(new java.io.File(s"$out/events.parquet").listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L)
      }
      doneEvents.getParentFile.mkdirs(); doneEvents.createNewFile()
    }
    out
  }
}

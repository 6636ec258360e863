package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests for the round-5 operators: each distributed plan
  * is checked pair-for-pair against an in-memory brute-force of the
  * same semantics on the sf0.001 corpus (the DuckDB gate re-proves
  * them at sf0.01; this pins the semantics in CI without DuckDB).
  */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private val dir = "/root/testdata/sf0.001"

  /** (event_id, user_id, micros, type, value) collected once. */
  private lazy val ev: Seq[(Long, Long, Long, String, Double)] =
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSeq

  test("tj1 as-of join matches the brute-force point-in-time lookup, " +
       "including at-or-before and max-event_id tie-breaks") {
    val purchases = ev.filter(_._4 == "purchase")
    val expected = ev.filter(_._4 == "click").map { case (cid, uid, cus, _, _) =>
      val eligible = purchases.filter(p => p._2 == uid && p._3 <= cus)
      val m =
        if (eligible.isEmpty) None
        else Some(eligible.maxBy(p => (p._3, p._1))._1)
      (cid, m)
    }.toMap
    val got = EventOps.tj1AsofJoin(spark, dir)
      .select(col("click_id"), col("purch_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == expected)
    assert(got.values.exists(_.isEmpty) || expected.values.forall(_.nonEmpty),
      "corpus should exercise the no-prior-purchase NULL arm when present")
  }

  test("tj2 interval join equals the naive theta-join (every same-user " +
       "error/click pair within the half-hour window, each exactly once)") {
    val errors = ev.filter(_._4 == "error")
    val clicks = ev.filter(_._4 == "click")
    val expected = (for {
      e <- errors; c <- clicks
      if e._2 == c._2 && math.abs(c._3 - e._3) <= 1800L * 1000000L
    } yield (e._1, c._1, c._3 - e._3)).toSet
    val rows = EventOps.tj2IntervalJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == rows.toSet.size, "bucketed join emitted a duplicate pair")
    assert(rows.toSet == expected)
  }

  test("tj4 nearest-event join equals the per-error argmin of the naive " +
       "pair space (|gap| then click_id tie-break, both directions)") {
    val errors = ev.filter(_._4 == "error")
    val clicks = ev.filter(_._4 == "click")
    val expected = errors.flatMap { e =>
      val cand = clicks.filter(c =>
        c._2 == e._2 && math.abs(c._3 - e._3) <= 1800L * 1000000L)
      if (cand.isEmpty) None
      else {
        val best = cand.minBy(c => (math.abs(c._3 - e._3), c._1))
        Some((e._1, best._1, best._3 - e._3))
      }
    }.toSet
    val rows = EventOps.tj4NearestEvent(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.nonEmpty && rows == expected)
  }

  test("se1 JSON extraction aggregates exactly the embedded props.k") {
    val K = """"k"\s*:\s*(-?\d+)""".r
    val props = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("props")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = props.groupBy(_._1).map { case (t, rs) =>
      val ks = rs.flatMap(r => K.findFirstMatchIn(r._2).map(_.group(1).toLong))
      t -> (ks.length.toLong, ks.sum, ks.min, ks.max)
    }
    val got = EventOps.se1JsonExtract(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("se3 CSV schema-on-read: corrupt-line accounting matches a " +
       "driver-side recompute and PERMISSIVE parsing nulls bad fields") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, rs) =>
      val ok = rs.filter(_._2 % 13 != 0).map(_._2)
      t -> ((ok.length.toLong, (rs.length - ok.length).toLong,
        ok.map(_ % 7).sum, ok.map(_ % 100).sum))
    }
    val got = EventOps.se3CsvParse(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    assert(got.values.map(_._2).sum > 0L, "vacuous: no corrupt lines")
    // engine-behavior pin: a malformed BIGINT field parses to null
    // (PERMISSIVE), never an exception or a coerced value
    import spark.implicits._
    val p = Seq("x5,oops", "1,click,2").toDF("line")
      .select(from_csv(col("line"),
        org.apache.spark.sql.types.StructType
          .fromDDL("a BIGINT, b STRING, c BIGINT"),
        Map.empty[String, String]).as("p"))
      .select(col("p.a"), col("p.b"), col("p.c"))
      .collect()
    assert(p(0).isNullAt(0) && p(0).getString(1) == "oops" && p(0).isNullAt(2))
    assert(p(1).getLong(0) == 1L && p(1).getString(1) == "click" &&
      p(1).getLong(2) == 2L)
  }

  test("q23 snapshot diff: the full-outer-join classification equals " +
       "the per-key modular arithmetic the snapshots were built from") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = ev.flatMap { case (id, t) =>
      val cls =
        if (id % 11 == 0 && id % 7 == 0) None
        else if (id % 11 == 0) Some("added")
        else if (id % 7 == 0) Some("removed")
        else if (id % 5 == 0) Some("changed")
        else Some("unchanged")
      cls.map(c => (t, c))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.operators.Analytics.q23SnapshotDiff(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    // non-vacuous: all four classes appear somewhere
    assert(got.keySet.map(_._2) ===
      Set("added", "removed", "changed", "unchanged"))
  }

  test("q23 corpus assumptions: events.value is never NULL and small " +
       "enough that +1.0 is never absorbed (oracle-agreement preconditions)") {
    // q23 classifies 'changed' by a null-safe DOUBLE compare while the
    // DuckDB oracle classifies by pure event_id%5 arithmetic; the two
    // agree only while these corpus properties hold (round-12 advisory).
    val bad = graft.Tables.events(spark, dir)
      .select(col("value"))
      .filter(col("value").isNull || abs(col("value")) >= lit(math.pow(2, 52)))
      .count()
    assert(bad === 0L, "events.value violates q23's non-null/small-" +
      "magnitude assumption — the gate's oracle agreement is no longer pinned")
  }

  test("q24 incremental merge: folding partial states equals the " +
       "one-shot aggregation EXACTLY (integer sums are a true monoid)") {
    import org.apache.spark.sql.functions.{date_trunc, round => sround}
    val oneShot = graft.Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        sround(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val merged = graft.operators.Analytics.q24IncrementalMerge(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(merged.keySet === oneShot.keySet)
    merged.foreach { case (k, (n, c, v)) =>
      assert(n === oneShot(k)._1, s"$k count")
      assert(c === oneShot(k)._2, s"$k cents — the merge identity is EXACT")
      assert(v === c / 100.0, s"$k derived sum")
    }
    // the state/delta split actually partitions the table (non-vacuous)
    val ids = graft.Tables.events(spark, dir)
      .select(col("event_id")).collect().map(_.getLong(0))
    assert(ids.exists(_ % 3 == 0) && ids.exists(_ % 3 != 0))
  }

  private def docsWords: Seq[(Long, Array[String])] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))

  test("dd12 chunk dedup equals brute-force 10-word chunking") {
    val chunks = docsWords.flatMap { case (id, w) =>
      w.grouped(10).filter(_.length == 10).map(c => (id, c.mkString(" ")))
    }
    val expected = chunks.groupBy(_._2).collect {
      case (chunk, occ) if occ.map(_._1).distinct.size >= 2 =>
        (chunk, occ.map(_._1).distinct.size.toLong, occ.size.toLong)
    }.toSet
    val got = TextOps.dd12ChunkDedup(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("dd13 n-gram contamination equals brute-force 7-gram overlap " +
       "against the held-out slice") {
    val grams = docsWords.map { case (id, w) =>
      (id, w.sliding(7).filter(_.length == 7).map(_.mkString(" ")).toSet)
    }
    val evalSet = grams.filter(_._1 % 20 == 7).flatMap(_._2).toSet
    val expected = grams.filter(_._1 % 20 != 7).collect {
      case (id, g) if (g & evalSet).nonEmpty => (id, (g & evalSet).size.toLong)
    }.toMap
    val got = TextOps.dd13NgramContamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  /** Brute cosine with the operators' exact arithmetic: left-to-right
    * double accumulation + HALF_UP rounding to 9 decimals. */
  private def vecs: Seq[(Long, Int, Array[Double])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))

  private def sim9(a: Array[Double], b: Array[Double]): Double = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }; s
    }
    BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("ann9 filtered top-k equals brute-force same-label ranking") {
    val vs = vecs
    val expected = vs.filter(_._1 % 50 == 0).flatMap { case (q, ql, qv) =>
      vs.filter(v => v._1 != q && v._2 == ql)
        .map(v => (v._1, sim9(qv, v._3)))
        .sortBy { case (id, s) => (-s, id) }
        .take(5).zipWithIndex
        .map { case ((n, s), i) => (q, n, s, i + 1) }
    }.toSet
    val got = VectorOps.ann9FilteredTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("ann10 range search returns exactly the tau-ball, no truncation") {
    val vs = vecs
    val expected = vs.filter(_._1 % 50 == 0).flatMap { case (q, _, qv) =>
      vs.filter(_._1 != q)
        .map(v => (q, v._1, sim9(qv, v._3)))
        .filter(_._3 >= 0.30)
    }.toSet
    val got = VectorOps.ann10RangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-8 curation/selection operators beyond their
  * DuckDB gates: cp3's shard-decomposed top-K is EXACTLY the
  * single-window top-K (the claim that lets a monster domain avoid a
  * one-partition window), dd17's survivors honor the incremental
  * contract, and ta10's importance weights actually separate the
  * target slice from the rest (non-vacuous scoring).
  */
class CurationOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cp3 shard-decomposed cap == single-window cap, at several caps") {
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables.documents
    for (cap <- Seq(1, 3, 10, 25)) {
      val twoStage = graft.operators.TextOps.cp3DomainCap(spark, dir, cap)
        .select("doc_id", "source", "rn").collect().map(_.toSeq).toSet
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val oneWindow = documents(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cap)
        .select("doc_id", "source", "rn").collect().map(_.toSeq).toSet
      assert(twoStage == oneWindow, s"cap=$cap: two-stage != one-window")
    }
  }

  test("cp6 keeps the smallest language whole and flattens the mix toward sqrt shares") {
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables.documents
    val orig = documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.operators.TextOps.cp6TemperatureMix(spark, dir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSrc = orig.minBy(_._2)._1
    // rate for the smallest language is exactly 1 -> kept whole
    assert(kept(minSrc) == orig(minSrc), "smallest language was downsampled")
    // every source's kept count tracks its expected n_min^(1-a) * n_d^a
    // within binomial noise (the md5 coin is uniform)
    val nMin = orig(minSrc).toDouble
    orig.foreach { case (src, n) =>
      val expect = math.sqrt(nMin * n)
      val tol = 4 * math.sqrt(expect) + 3
      assert(math.abs(kept.getOrElse(src, 0L) - expect) <= tol,
        s"$src kept ${kept.getOrElse(src, 0L)}, expected ~$expect (±$tol)")
    }
    // the mix is genuinely flatter: max/min share ratio shrinks
    val ratioBefore = orig.values.max.toDouble / orig.values.min
    val ratioAfter = kept.values.max.toDouble / kept.values.min
    assert(ratioAfter < ratioBefore,
      s"flattening failed: $ratioAfter !< $ratioBefore")
  }

  test("dd17 survivors: unique per fingerprint, absent from corpus, minimal id") {
    import graft.Tables.documents
    val out = graft.operators.TextOps.dd17IncrementalDedup(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty, "no batch survivors — gate vacuous")
    assert(rows.map(_.getString(1)).distinct.length == rows.length,
      "duplicate fingerprints among survivors")
    // every survivor is a batch doc and its fp is not in the corpus side
    val norm = regexp_replace(trim(lower(substring(col("text"), 1, 512))), "\\s+", " ")
    val fps = documents(spark, dir)
      .select(col("doc_id"), md5(substring(norm, 1, 64)).as("fp"))
    val corpusFps = fps.filter(col("doc_id") % 4 =!= 0)
      .select("fp").collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(r.getLong(0) % 4 == 0, s"survivor ${r.getLong(0)} not a batch doc")
      assert(!corpusFps.contains(r.getString(1)),
        s"survivor ${r.getLong(0)} collides with the corpus")
    }
    // dropped batch docs either collided with corpus or lost in-batch min
    val batchTotal = fps.filter(col("doc_id") % 4 === 0).count()
    assert(rows.length < batchTotal, "nothing was dropped — gate vacuous")
  }

  test("cp7 composed pipeline honors every stage's invariant at once") {
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.operators.TextOps.cp7FullCuration(spark, dir,
      cap = 10, budget = 600, shards = 8).collect()
    assert(out.nonEmpty, "composed pipeline emitted nothing — vacuous")
    val rows = out.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getInt(3), r.getLong(4), r.getInt(5)))
    // stage-2 cap: no source exceeds `cap` docs
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 10, s"$src exceeds the domain cap: ${rs.length}")
    }
    // stage-3 budget: per-source token totals stay within budget (the
    // prefix-sum filter ran BEFORE mixing, so survivors sum under it)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._4.toLong).sum <= 600, s"$src exceeds token budget")
    }
    // stage-5 sharding: positions are 1..n_shard dense per shard, and
    // the shard is the doc's md5 bucket
    rows.groupBy(_._5).foreach { case (shard, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1 to rs.length),
        s"shard $shard positions not dense")
    }
    // stage-1 dedup: no surviving batch doc (id%4==0) may share a
    // fingerprint with any standing-corpus doc
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        md5(substring(regexp_replace(trim(lower(substring(col("text"), 1, 512))),
          "\\s+", " "), 1, 64)).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpusFps = fps.collect { case (id, fp) if id % 4 != 0 => fp }.toSet
    rows.filter(_._1 % 4 == 0).foreach { case (id, _, _, _, _, _) =>
      assert(!corpusFps.contains(fps(id)),
        s"batch doc $id duplicates a standing-corpus fingerprint")
    }
  }

  test("ta10 weights separate the target slice from the rest") {
    import graft.Tables.documents
    val w = graft.operators.TextOps.ta10ImportanceWeights(spark, dir)
      .join(documents(spark, dir).select("doc_id", "lang"), "doc_id")
    val avg = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg(col("weight")))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // The synthetic corpus shares one vocabulary across langs, so the
    // absolute level is dominated by Laplace smoothing (both means sit
    // below zero); the invariant that matters is ORDER — target docs
    // must score strictly above the rest on average.
    assert(avg(true) > avg(false),
      s"target-slice mean weight ${avg(true)} not above raw ${avg(false)}")
  }

  test("piiRedact: exact counts and exact scrubbed bytes on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b@x.io and c_d%e@y.org or call +1-555-0199 now"),
      (2L, "no pii here"),
      (3L, "+1-555-12345 has a fifth digit outside the match")).toDF("doc_id", "t")
    val got = graft.operators.TextOps.piiRedact(docs, col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) === ((2L, 1L, "mail [EMAIL] and [EMAIL] or call [PHONE] now")))
    assert(got(2L) === ((0L, 0L, "no pii here")))
    // the phone pattern is bounded at 4 digits: the first 4 match, the
    // 5th survives — redaction never eats neighboring bytes
    assert(got(3L) === ((0L, 1L, "[PHONE]5 has a fifth digit outside the match")))
  }

  test("canonicalizeUrl: case table covering every rule and their repairs") {
    import spark.implicits._
    val cases = Seq(
      // host lowering + www strip + trailing slash
      "https://WWW.Ex.COM/p/1/" -> "https://ex.com/p/1",
      // fragment drop + utm strip repairs the separator chain
      "https://ex.com/p/1?utm_source=a&ref=2#f" -> "https://ex.com/p/1?ref=2",
      "https://ex.com/p?id=3&utm_campaign=x" -> "https://ex.com/p?id=3",
      // a query that was ONLY tracking vanishes entirely
      "https://ex.com/?utm_source=x" -> "https://ex.com",
      // http scheme, host-only lowering (path case preserved)
      "http://WwW.A.b/Q" -> "http://a.b/Q",
      // non-URL input passes through the generic steps untouched
      "notaurl" -> "notaurl")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), graft.operators.TextOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"canonicalizeUrl($in)")
    }
  }

  test("cp12 mixture weights: shares sum to 1, repeat factors invert " +
       "the share ratio, and a uniform-share source gets factor ~1") {
    val rows = graft.operators.TextOps.cp12MixtureWeights(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val k = rows.length
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    val t = rows.map(_._3).sum
    rows.foreach { case (src, _, tok, share, rf) =>
      assert(share === tok.toDouble / t, s"$src share")
      // repeat factor is the uniform target over the actual share,
      // computed in the operator's exact op order
      assert(rf === (t.toDouble / k) / tok, s"$src repeat")
      // weighted token mass after repeating: rf * tok == t/k for all
      assert(math.abs(rf * tok - t.toDouble / k) < 1e-6, s"$src mass")
    }
  }

  test("dd25 source matrix: cells match a driver-side rollup of the " +
       "dd5 pairs by unordered source pair; totals conserve") {
    val srcs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.TextOps.dd5LshPairs(spark, dir)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (srcs(a), srcs(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.operators.TextOps.dd25SourceMatrix(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    // every verified pair lands in exactly one cell
    assert(got.values.sum === pairs.length.toLong)
    assert(got.nonEmpty)
  }

  test("dd24 dedup impact: totals match the corpus, dropped = clustered " +
       "minus keepers per source, share is the exact division") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
    val clustered = graft.operators.TextOps.dd9NearDupClusters(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val keepers = graft.operators.TextOps.dd15ClusterKeeper(spark, dir)
      .collect().map(_.getLong(1)).toSet
    val droppedIds = clustered -- keepers
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val dropped = ds.filter(d => droppedIds(d._1))
      val nt = ds.map(_._3).sum
      val td = dropped.map(_._3).sum
      src -> ((ds.length.toLong, nt, dropped.length.toLong, td,
        td.toDouble / nt))
    }
    val got = graft.operators.TextOps.dd24DedupImpact(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expect)
    assert(got.values.map(_._3).sum > 0L, "vacuous: nothing dropped")
  }
}

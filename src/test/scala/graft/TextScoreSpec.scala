package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ta13 bigram-LM scoring and dd19 repeated-span detection: micro-corpus
  * tests with hand-computed expectations (written to a temp documents
  * parquet so the ops run their real read path), plus structural
  * invariants at sf0.001. Engine-divergence exactness is the driver
  * gate's job; these pin the SEMANTICS. */
class TextScoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a tiny documents.parquet under a temp dir and return the dir. */
  private def microCorpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_textscore").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ta13 bigram-LM: hand-computed log-prob means on a micro corpus") {
    spark.sparkContext.setLogLevel("ERROR")
    // corpus bigrams: doc1 = ab, ba, ab; doc2 = ab, bc
    // counts: c(a,b)=3 c(b,a)=1 c(b,c)=1; left contexts: c(a,.)=3 c(b,.)=2
    // doc1 lps: ln(3/3)=0, ln(1/2), ln(3/3)=0  -> mean = ln(1/2)/3
    // doc2 lps: ln(3/3)=0, ln(1/2)             -> mean = ln(1/2)/2
    val dir = microCorpus(Seq(1L -> "a b a b", 2L -> "a b c"))
    val got = graft.operators.TextOps.ta13BigramLmScore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(got.map(t => (t._1, t._2)) == List((1L, 3L), (2L, 2L)))
    val l2 = math.log(0.5)
    assert(math.abs(got(0)._3 - l2 / 3) < 0.006) // round(...,2) slack
    assert(math.abs(got(1)._3 - l2 / 2) < 0.006)
  }

  test("ta13 invariants at sf0.001: one row per >=2-token doc, " +
       "n_bigrams == n_tokens - 1, scores are non-positive") {
    val dir = "/root/testdata/sf0.001"
    val scored = graft.operators.TextOps.ta13BigramLmScore(spark, dir)
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).as("n_tokens"))
      .filter(col("n_tokens") >= 2)
    val joined = scored.join(toks, Seq("doc_id"), "full").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(3),
        s"doc ${r.get(0)}: gate and >=2-token corpus must cover the same docs")
      assert(r.getLong(1) == r.getInt(3) - 1,
        s"doc ${r.get(0)}: n_bigrams ${r.getLong(1)} != n_tokens-1 ${r.getInt(3) - 1}")
      assert(r.getDouble(2) <= 0.0, s"doc ${r.get(0)}: positive log-prob")
    }
  }

  test("dd19 span dedup: a span shared by two docs is flagged in both, " +
       "unique-span docs are absent") {
    val shared = "t1 t2 t3 t4 t5 t6 t7 t8"
    val dir = microCorpus(Seq(
      1L -> s"$shared x",      // spans: [shared], [t2..x]
      2L -> s"z $shared",      // spans: [z..t7], [shared]
      3L -> "p q r s t u v w", // one unique span
      4L -> "too short"))      // < 8 tokens: no spans at all
    val got = graft.operators.TextOps.dd19SpanDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toList == List((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("dd19 invariants at sf0.001: dup spans bounded by spans, ratios in " +
       "(0,1], and the flagged-doc set matches an independent formulation") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.dd19SpanDedup(spark, dir).collect()
    assert(got.nonEmpty, "corpus has no cross-doc duplicated spans — vacuous")
    got.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    // independent formulation: distinct (doc, span) pairs where the span's
    // distinct-doc count >= 2 — via a window instead of the agg+semi-join
    import org.apache.spark.sql.expressions.Window
    val spans = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 7),
        i => concat_ws(" ", slice(col("w"), i, lit(8))))).as("span"))
    val flagged = spans
      .withColumn("nd", size(collect_set(col("doc_id"))
        .over(Window.partitionBy(col("span")))))
      .filter(col("nd") >= 2)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == flagged)
  }

  test("dd20 containment: a quoted substring is contained in its source " +
       "(directed), near-identical docs flag BOTH directions") {
    // doc2's 6 tokens = a contiguous slice of doc1's 12 -> all 4 of
    // doc2's shingles appear among doc1's 10: containment(2->1) = 1.0,
    // containment(1->2) = 0.4 (below 0.8, direction absent).
    // doc3/doc4 differ in ONE trailing token of 12: 10 shared shingles
    // of 10/10 each... doc4 ends differently so its last 2 shingles
    // change: 8 shared of 10 -> 0.8, both directions emitted.
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val quote = (4 to 9).map(i => s"w$i").mkString(" ")
    val v3 = (1 to 12).map(i => s"v$i").mkString(" ")
    val v4 = ((1 to 10).map(i => s"v$i") ++ Seq("x", "v12")).mkString(" ")
    val dir = microCorpus(Seq(1L -> base, 2L -> quote, 3L -> v3, 4L -> v4))
    val got = graft.operators.TextOps.dd20Containment(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === Set((2L, 1L), (3L, 4L), (4L, 3L)))
    assert(got((2L, 1L)) === ((4L, 1.0)))
    assert(got((3L, 4L)) === ((8L, 0.8)))
    assert(got((4L, 3L)) === ((8L, 0.8)))
  }

  test("cp9 subset prune: the quote drops toward its source, the " +
       "equal-size near-twin tie-breaks to the smaller id") {
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val quote = (4 to 9).map(i => s"w$i").mkString(" ")
    val v3 = (1 to 12).map(i => s"v$i").mkString(" ")
    val v4 = ((1 to 10).map(i => s"v$i") ++ Seq("x", "v12")).mkString(" ")
    val dir = microCorpus(Seq(1L -> base, 2L -> quote, 3L -> v3, 4L -> v4))
    val got = graft.operators.TextOps.cp9SubsetPrune(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc2 contained in the strictly larger doc1; doc3/doc4 are
    // equal-size mutual 0.8-containers -> only doc4 drops (id tie-break)
    assert(got === Map(2L -> ((1L, 1L)), 4L -> ((3L, 1L))))
  }

  test("dd20 hub cap: shingles above maxDf carry no containment signal") {
    // three docs share one boilerplate sentence; with maxDf=2 its
    // shingles are dropped, so no pair reaches the threshold
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val dir = microCorpus(Seq(
      1L -> s"$boiler only one two three",
      2L -> s"$boiler just four five six",
      3L -> s"$boiler more seven eight nine"))
    val capped = graft.operators.TextOps
      .dd20Containment(spark, dir, minContain = 0.5, maxDf = 2)
    assert(capped.count() === 0L)
    // uncapped, the boilerplate dominates every doc's kept set
    val open = graft.operators.TextOps
      .dd20Containment(spark, dir, minContain = 0.5, maxDf = 100)
    assert(open.count() === 6L)
  }

  test("ta15 winnowing: the coverage guarantee holds for every complete " +
       "window of every corpus doc, and short docs emit nothing") {
    val dir = "/root/testdata/sf0.001"
    val fp = graft.operators.TextOps.winnowFingerprints(spark, dir, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fp.nonEmpty)
    // density sanity: winnowing selects ~2/(w+1) of kgrams — never
    // more than the window count, never less than 1 per complete window
    val byDoc = fp.groupBy(_._1)
    // COVERAGE GUARANTEE: every window of 4 consecutive kgram
    // positions contains at least one selected fingerprint. Recompute
    // the per-doc kgram counts from the documents table.
    import org.apache.spark.sql.functions._
    val m = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        (size(split(trim(lower(col("text"))), "\\s+")) - 2).as("m"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (doc, rows) =>
      val sel = rows.map(_._2).toSet
      val mm = m(doc)
      (0 to mm - 4).foreach { j =>
        assert((j until j + 4).exists(sel),
          s"doc $doc window $j has no fingerprint")
      }
      // selected positions are valid kgram positions
      assert(sel.forall(p => p >= 0 && p < mm))
    }
    // every doc with >= 4 kgrams fingerprints; no doc below can
    m.foreach { case (doc, mm) =>
      assert(byDoc.contains(doc) === (mm >= 4), s"doc $doc m=$mm")
    }
  }

  test("ta20/ta21 trained BPE: hand-computed merge table and token " +
       "counts on a micro corpus (ties to the smallest pair)") {
    // vocab: abab ×3, cd ×3. pairs r0: (a,b)=6 (b,a)=3 (c,d)=3 →
    // merge (a,b); r1: (ab,ab)=3 ties (c,d)=3, 'ab' < 'c' → (ab,ab);
    // r2: (c,d)=3; r3..: no pairs left → empty best rows.
    val dir = microCorpus(Seq(
      1L -> "abab abab cd", 2L -> "abab cd cd"))
    val merges = graft.operators.TextOps.ta20BpeMerges(spark, dir, merges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (0, "a", "b", 6L), (1, "ab", "ab", 3L), (2, "c", "d", 3L)))
    val applied = graft.operators.TextOps.ta21BpeApply(spark, dir, merges = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every word fully merged to ONE token by round 3
    assert(applied.toSeq === Seq((1L, 3L, 10L, 3L), (2L, 3L, 8L, 3L)))
  }

  test("ta20 BPE same-symbol runs: replace-all IS greedy left-to-right " +
       "(floor(run/2) merges), and ties break on the SECOND symbol too") {
    // vocab: aaaa ×1, aaa ×1. r0: (a,a)=5 → aaaa→[aa,aa], aaa→[aa,a]
    // (leftmost, non-overlapping). r1: (aa,aa)=1 ties (aa,a)=1 →
    // y 'a' < 'aa' → (aa,a); r2: (aa,aa) → both words single-token.
    val dir = microCorpus(Seq(1L -> "aaaa aaa"))
    val merges = graft.operators.TextOps.ta20BpeMerges(spark, dir, merges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (0, "a", "a", 5L), (1, "aa", "a", 1L), (2, "aa", "aa", 1L)))
    val applied = graft.operators.TextOps.ta21BpeApply(spark, dir, merges = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(applied.toSeq === Seq((1L, 2L)))
  }

  test("ta15 array-side window-min equals the explode baseline " +
       "row-for-row (Ta15WindowSpec contract)") {
    val dir = "/root/testdata/sf0.001"
    for (w <- Seq(3, 4, 6)) {
      val fast = graft.operators.TextOps.winnowFingerprints(spark, dir, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      val base = graft.operators.TextOps.winnowFingerprintsExplode(spark, dir, w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      assert(fast === base, s"w=$w: array form diverged from explode baseline")
      assert(fast.nonEmpty)
    }
  }

  test("dd22 threshold sweep: counts are non-increasing in the threshold " +
       "and each row equals a direct filter of the dd3 pair list") {
    val dir = "/root/testdata/sf0.001"
    val pairs = graft.operators.TextOps.dd3JaccardPairs(spark, dir)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val sweep = graft.operators.TextOps.dd22ThresholdSweep(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(sweep.nonEmpty)
    sweep.foreach { case (t, np, nd) =>
      val qual = pairs.filter(_._2 >= t)
      assert(np === qual.length.toLong, s"t=$t pairs")
      assert(nd === qual.map(_._1).distinct.length.toLong, s"t=$t dropped")
    }
    sweep.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3, "sweep not monotone")
      case _ =>
    }
  }

  test("dd20 prefix filtering: pair-for-pair equal to the unfiltered " +
       "posting self-join, at sf0.001 and across thresholds") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // sf0.001: the real corpus, gate parameters
    val dir = "/root/testdata/sf0.001"
    val pf = rows(graft.operators.TextOps.dd20Containment(spark, dir))
    val full = rows(graft.operators.TextOps
      .dd20Containment(spark, dir, prefixFilter = false))
    assert(pf.nonEmpty, "vacuous: gate corpus must produce pairs")
    assert(pf === full)
    // micro corpus at thresholds that stress the prefix-length floor —
    // including t*n_a landing an ulp above an exact integer (0.8*5)
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val quote = (4 to 9).map(i => s"w$i").mkString(" ") // n_a = 4 kept
    val seven = (3 to 9).map(i => s"w$i").mkString(" ") // n_a = 5 kept
    val mdir = microCorpus(Seq(1L -> base, 2L -> quote, 3L -> seven))
    for (t <- Seq(0.5, 0.8, 0.9, 1.0)) {
      val a = rows(graft.operators.TextOps
        .dd20Containment(spark, mdir, minContain = t))
      val b = rows(graft.operators.TextOps
        .dd20Containment(spark, mdir, minContain = t, prefixFilter = false))
      assert(a === b, s"prefix-filtered != unfiltered at t=$t")
    }
  }

  test("ta14 BM25: hand-computed scores and ranking on a micro corpus") {
    // vocab x/y/z all df=2, N=3, dl = 3/2/4, avgdl = 3 -> one query
    // {x,y,z}; idf = ln(1.5/2.5) < 0 (the negative-idf regime)
    //   doc1: x c=2 tfn=4.4/3.2, y c=1 tfn=2.2/2.2  -> 2.375·idf
    //   doc2: x,z c=1 len=2 tfn=2.2/1.9 each        -> 2.31578..·idf
    //   doc3: y c=3 tfn=6.6/4.5, z c=1 tfn=2.2/2.5  -> 2.34666..·idf
    val dir = microCorpus(Seq(1L -> "x x y", 2L -> "x z", 3L -> "y y y z"))
    val got = graft.operators.TextOps.ta14Bm25(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toList
    assert(got == List(
      (0L, 2L, -1.1830, 1), (0L, 3L, -1.1987, 2), (0L, 1L, -1.2132, 3)))
  }

  test("ta14 invariants at sf0.001: contiguous per-query ranks, scores " +
       "non-increasing, ties broken by doc_id") {
    val rows = graft.operators.TextOps.ta14Bm25(spark, "/root/testdata/sf0.001")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toList == (1 to rs.length).toList,
        s"qid $qid: ranks not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"qid $qid: rank order violates (score desc, doc_id asc)")
        case _ =>
      }
    }
  }

  test("ta17 readability: hand-computed counts and Flesch score on a " +
       "micro corpus, including the zero-sentence guard") {
    // doc 1: "The cat sat. It ran!" -> words 6, vowel runs: e,a,a,i,a = 6
    //   (the/cat/sat/it/ran each 1 + ... count carefully below),
    //   sentences 2. doc 2: no terminator -> greatest(0,1) guard.
    val dir = microCorpus(Seq(1L -> "The cat sat. It ran!", 2L -> "word"))
    val got = graft.operators.TextOps.ta17Readability(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // lower("The cat sat. It ran!") word runs: the,cat,sat,it,ran = 5
    // vowel runs: e,a,a,i,a = 5; terminator runs: ".", "!" = 2
    assert(got(1L)._1 === 5L && got(1L)._2 === 5L && got(1L)._3 === 2L)
    assert(got(1L)._4 === 206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5))
    // "word": 1 word, 1 vowel run, 0 sentences -> denominator guard 1
    assert(got(2L)._1 === 1L && got(2L)._2 === 1L && got(2L)._3 === 0L)
    assert(got(2L)._4 === 206.835 - 1.015 * (1.0 / 1) - 84.6 * (1.0 / 1))
  }

  test("ta17 at sf0.001: counts match an independent Java-regex " +
       "driver-side recompute for every doc") {
    val dir = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def cnt(t: String, p: String): Long =
      java.util.regex.Pattern.compile(p).matcher(t).results().count()
    val got = graft.operators.TextOps.ta17Readability(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === texts.keySet)
    got.foreach { case (id, (w, y, sn)) =>
      val t = texts(id).toLowerCase
      assert(w === cnt(t, "[a-z]+"), s"doc $id words")
      assert(y === cnt(t, "[aeiou]+"), s"doc $id syllables")
      assert(sn === cnt(t, "[.!?]+"), s"doc $id sentences")
    }
  }

  test("ta18 span novelty: hand-computed on a micro corpus — first " +
       "owner wins, copies score the copied fraction") {
    // doc 1: 9 tokens -> 2 spans, all first-owned -> novelty 1.0
    // doc 2: copies doc 1's first 8 tokens (1 span, owned by doc 1)
    //        + fresh tail -> 3 spans, 2 novel
    val d1 = "a b c d e f g h i"
    val d2 = "a b c d e f g h x y"
    val dir = microCorpus(Seq(1L -> d1, 2L -> d2))
    val got = graft.operators.TextOps.ta18SpanNovelty(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((3L, 2L, 2.0 / 3)))
  }

  test("ta18 at sf0.001: novelty matches a driver-side recompute; the " +
       "lowest doc_id with spans is fully novel") {
    val dir = "/root/testdata/sf0.001"
    val spans = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val w = r.getString(1).trim.toLowerCase.split("\\s+")
        if (w.length < 8) Seq.empty
        else w.sliding(8).map(g => r.getLong(0) -> g.mkString(" ")).toSeq
      }
    val owner = spans.groupBy(_._2).map { case (sp, o) => sp -> o.map(_._1).min }
    val expect = spans.groupBy(_._1).map { case (id, ss) =>
      val novel = ss.count(s => owner(s._2) == id).toLong
      id -> ((ss.length.toLong, novel, novel.toDouble / ss.length))
    }
    val got = graft.operators.TextOps.ta18SpanNovelty(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expect)
    assert(got(got.keySet.min)._3 === 1.0)
  }

  test("ta19 langid confusion: cells match a driver-side crosstab of " +
       "ta3 predictions vs ground truth; shares sum to 1 per actual") {
    val dir = "/root/testdata/sf0.001"
    val truth = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pred = graft.operators.TextOps.ta3LangId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectCells = truth.keys.toSeq
      .map(id => (truth(id), pred(id)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = graft.operators.TextOps.ta19LangidConfusion(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.map { case (k, v) => k -> v._1 } === expectCells)
    // shares within each actual language sum to ~1 and each equals n/t
    rows.groupBy(_._1._1).foreach { case (actual, cells) =>
      val t = cells.values.map(_._1).sum
      cells.foreach { case ((_, p), (n, share)) =>
        assert(share === n.toDouble / t, s"$actual->$p share")
      }
      assert(math.abs(cells.values.map(_._2).sum - 1.0) < 1e-9,
        s"$actual shares don't sum to 1")
    }
    // confusion is non-trivial: more than one predicted class appears
    assert(rows.keySet.map(_._2).size > 1)
  }

  test("dd23 soft-dedup weights: every doc present, cluster mass sums " +
       "to ~1 per cluster, singletons weigh exactly 1.0, sizes match dd9") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.TextOps.dd23SoftDedupWeights(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = Tables.documents(spark, dir).count()
    assert(rows.length.toLong === n)
    val clusters = graft.operators.TextOps.dd9NearDupClusters(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = clusters.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    rows.foreach { case (id, size, w) =>
      clusters.get(id) match {
        case Some(c) =>
          assert(size === sizes(c), s"doc $id cluster size")
          assert(w === 1.0 / size, s"doc $id weight")
        case None =>
          assert(size === 1L && w === 1.0, s"unclustered doc $id")
      }
    }
    // per-cluster mass: k * (1/k) within IEEE accumulation error
    rows.filter(r => clusters.contains(r._1)).groupBy(r => clusters(r._1))
      .foreach { case (c, members) =>
        assert(math.abs(members.map(_._3).sum - 1.0) < 1e-9, s"cluster $c mass")
      }
    assert(clusters.nonEmpty, "vacuous: no near-dup clusters at sf0.001")
  }
}

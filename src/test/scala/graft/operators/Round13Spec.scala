package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-13 operator contracts: dd26 maximal duplicated regions,
  * ta22/ta23 unigram-LM tokenizer, ann21 beam-search serving. */
class Round13Spec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // ---- dd26 ----

  test("dd26 regions are >= 8 tokens, disjoint with >= 1 gap per doc, " +
       "and their anchor counts sum to dd19's per-doc dup-span counts") {
    val regions = TextOps.dd26DupRegions(spark, dir).collect()
    assert(regions.nonEmpty)
    regions.foreach { r =>
      val (start, end, len) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(len >= 8, s"region shorter than L: $r")
      assert(end - start + 1 === len)
    }
    regions.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // maximality: if the gap were <= 0 the runs would have merged
          assert(b.getLong(1) > a.getLong(2) - 7 + 1,
            s"adjacent anchor runs not merged: $a | $b")
        case _ => ()
      }
    }
    // n_anchors per region (len - 7) must roll up to dd19's n_dup_spans
    val fromRegions = regions.groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(3) - 7).sum }
    val dd19 = TextOps.dd19SpanDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    fromRegions.foreach { case (d, n) =>
      assert(dd19.getOrElse(d, 0L) === n,
        s"doc $d: dd26 anchors $n != dd19 dup spans ${dd19.get(d)}")
    }
    assert(fromRegions.keySet === dd19.filter(_._2 > 0).keySet)
  }

  // ---- ta22/ta23 ----

  test("unigram training is deterministic, keeps every single char, " +
       "and its probabilities sum to ~1") {
    val (v1, p1) = TextOps.unigramTrain(spark, dir)
    val (_, p2) = TextOps.unigramTrain(spark, dir)
    assert(p1 === p2)
    val vocab = v1.collect()
    val singles = vocab.filter(_.getString(0).length == 1)
    // every char of every corpus word must be a kept piece
    val chars = graft.Tables.documents(spark, dir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(singles.map(_.getString(0)).toSet))
    val probSum = vocab.map(_.getDouble(2)).sum
    assert(math.abs(probSum - 1.0) < 1e-6, s"prob sum $probSum")
  }

  test("ta23 token counts are bounded by chars/4 <= tokens <= chars " +
       "and consistent with whitespace tokens") {
    TextOps.ta23UnigramApply(spark, dir).collect().foreach { r =>
      val (ws, chars, uni) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(uni <= chars, s"more pieces than chars: $r")
      assert(uni * 4 >= chars, s"pieces too few for 4-char cap: $r")
      assert(uni >= ws, s"fewer pieces than words: $r")
    }
  }

  // ---- ann21 ----

  test("ann21 single-hop contract: with hops=1 and a beam wider than " +
       "any candidate set, the scored frame is exactly entries + " +
       "their out-neighbors (minus self)") {
    val entries = VectorOps.ann21Entries(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = VectorOps.knnGraphEdges(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected: Set[(Long, Long)] = entries.flatMap { case (q, e) =>
      (Set(e) ++ edges.getOrElse(e, Set.empty[Long])).map(c => (q, c))
    }.toSet.filter(p => p._1 != p._2)
    val got = VectorOps.ann21Scored(spark, dir, beam = 1000000, hops = 1)
      .select(col("q_id"), col("cand")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("ann21 beam search is deterministic and its recall payload is " +
       "well-formed") {
    val a = VectorOps.ann21BeamRecall(spark, dir).collect()
    val b = VectorOps.ann21BeamRecall(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val (k, hits, recall) = (r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(k === 3 && hits >= 0 && hits <= k)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits.toDouble / k) < 1e-12)
    }
  }
}

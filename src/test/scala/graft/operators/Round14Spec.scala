package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-14 contracts: the ann21 serving-quality fix (IVF-seeded beam
  * entries + degree-8 graph) and its dominance guarantee. */
class Round14Spec extends AnyFunSuite {

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "4").getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("ann21 entries: every query enters the graph with exactly 3 " +
       "IVF-probed seeds, deterministically") {
    val a = VectorOps.ann21Entries(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = VectorOps.ann21Entries(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq.sorted === b.toSeq.sorted)
    // exactly 3 entries per query (nprobe=4 cells of a sqrt-n codebook
    // always hold >= 3 non-query members at this sf)
    a.groupBy(_._1).foreach { case (q, es) =>
      assert(es.length === 3, s"query $q entered with ${es.length} seeds")
    }
  }

  test("ann21 beam recall@3 >= ann18 IVF recall@3 (mean over the same " +
       "query sample) — the serving index must not sign off worse " +
       "than the probe path it serves (r13 verdict item 3)") {
    val ivf = VectorOps.ann18RecallEval(spark, dir)
      .agg(avg(col("recall"))).head.getDouble(0)
    val beam = VectorOps.ann21BeamRecall(spark, dir)
      .agg(avg(col("recall"))).head.getDouble(0)
    assert(beam >= ivf - 1e-12,
      f"beam recall $beam%.3f fell below IVF recall $ivf%.3f")
  }

  // ---- ta24 ----

  test("ta24 classifier separates the held-out split: labeled " +
       "positives score strictly above labeled negatives on average, " +
       "and both prediction classes occur") {
    val rows = TextOps.ta24QualityClassifier(spark, dir).collect()
    val bucketOf = rows.map { r =>
      val id = r.getLong(0)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
      id -> java.lang.Long.parseLong(hex, 16) % 100
    }.toMap
    val heldout = rows.filter(r => bucketOf(r.getLong(0)) >= 50)
    val (pos, neg) = heldout.partition(_.getBoolean(3))
    assert(pos.nonEmpty && neg.nonEmpty)
    val posMean = pos.map(_.getLong(1)).sum.toDouble / pos.length
    val negMean = neg.map(_.getLong(1)).sum.toDouble / neg.length
    assert(posMean > negMean,
      f"no margin separation: pos $posMean%.1f vs neg $negMean%.1f")
    assert(rows.exists(!_.getBoolean(2)) && rows.exists(_.getBoolean(2)),
      "degenerate classifier: one prediction class only")
  }

  // ---- cp13 ----

  test("cp13 written lake: hive lang partitions, every data file " +
       "doc_id-sorted internally, per-lang file ranges pairwise " +
       "disjoint, and the re-read equals the source table") {
    val reread = TextOps.cp13LayoutWrite(spark, dir, force = true).collect()
    val src = graft.Tables.documents(spark, dir).count()
    assert(reread.length.toLong === src)
    val lake = TextOps.cp13LakeDir(dir)
    val langDirs = lake.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("lang="))
    assert(langDirs.nonEmpty, "no hive lang= partition directories")
    langDirs.foreach { ld =>
      val files = ld.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty, s"empty partition dir ${ld.getName}")
      val ranges = files.map { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select(col("doc_id")).collect().map(_.getLong(0))
        assert(ids.sameElements(ids.sorted),
          s"${f.getName} not doc_id-sorted within the file")
        (ids.min, ids.max)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, aMax), (bMin, _)) =>
          assert(bMin > aMax,
            s"${ld.getName}: overlapping file ranges ($aMax >= $bMin)")
        case _ => ()
      }
    }
  }
}

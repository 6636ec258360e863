package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{DistanceJoin, GeoQueries, KnnJoin, Progressive, ProgressiveTyped, SkewBalancing, SpatialJoin}
import graft.sources.ScaleCorpus

/** Measured scale-up experiment (the reference's own evaluation shape,
  * `TSAS-Experiments/speedupExp.sh:17-30`, turned into a scale-UP
  * curve): build N× corpora with [[ScaleCorpus]] (S10 jitter spread
  * over a disjoint domain grid; token-suffixed text; permuted-sign
  * embeddings), run the flagship paths at each N, and print one JSON
  * line per N with per-query seconds, output rows, and the A6
  * per-partition stats (hot-spot proof) for the batch join.
  *
  * Queries: sp3 batch IM counts, sp12 balanced, pr1/pr10 progressive,
  * seg exact vs early-exit (the J8 flag decision, measured), dd5/dd8/
  * dd11 dedup, ann5/ann8 ANN.
  *
  * Usage: runMain graft.Scale [baseSfDir] [mults] [outBase]
  *   e.g.  runMain graft.Scale /root/testdata/sf0.01 1,10,100 /root/repo/scale
  */
object Scale {

  private def timed(runs: Int)(body: => Long): (Double, Long) = {
    val rs = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (rs.map(_._1).min, rs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mults = args.lift(1).getOrElse("1,10,100").split(",").map(_.trim.toInt)
    val outBase = args.lift(2).getOrElse("/root/repo/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- mults) {
      val dataDir = ScaleCorpus.ensureScaledDir(spark, baseDir, n, outBase)
      // ONE domain grid shared by every corpus in the join experiments:
      // per-corpus grids would misalign copy k of source vs target and
      // manufacture cross-copy pairs
      val bases = Map(
        "part" -> GeoQueries.partBoxes(spark, baseDir),
        "supp" -> GeoQueries.supplierBoxes(spark, baseDir),
        "tri" -> GeoQueries.customerTriangles(spark, baseDir))
      val b = bases.values.reduce(_.unionByName(_))
        .agg(min("minx"), min("miny"), max("maxx"), max("maxy")).head
      val domain = Some((b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3)))
      def scaledFrame(key: String): DataFrame =
        graft.spark.DfCache.memo(spark, s"scale#$baseDir#$n#$key") {
          SpatialJoin.entities(ScaleCorpus.scaledWkt(bases(key), n, domain = domain),
            col("id"), col("wkt"))
        }
      val partS = scaledFrame("part")
      val suppS = scaledFrame("supp")
      val triS = scaledFrame("tri")
      // untimed warmup: materialize the persisted corpora (Bench
      // methodology — measure the query, not the corpus build)
      val corpus = Map(
        "part" -> partS.count(), "supp" -> suppS.count(), "tri" -> triS.count(),
        "docs" -> Tables.documents(spark, dataDir).count(),
        "vecs" -> Tables.embeddings(spark, dataDir).count())

      val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
      results("sp3_relation_counts") = timed(2) {
        SpatialJoin.relationCounts(partS, suppS).count() }
      results("sp12_balanced_im") = timed(2) {
        SkewBalancing.balancedDe9im(triS, suppS, zThreshold = 0.0).count() }
      results("pr1_progressive_mbro") = timed(2) {
        Progressive.progressiveVerify(partS, suppS, "w_mbro",
          budget = 200 * n, relation = "contains").count() }
      results("pr10_early_stopping") = timed(2) {
        ProgressiveTyped.earlyStopping(partS, suppS, "w_js",
          relation = "contains", batchSize = 100,
          precisionLevel = 0.0, maxViolations = 1).toDF().count() }
      // J8 early-exit decision: forced-segmented adaptive IM (the sp10
      // shape), exact union form vs RANK early-exit, same corpus
      results("seg_exact") = timed(2) {
        SpatialJoin.de9imAdaptive(triS, suppS, minPoints = 4).count() }
      results("seg_earlyexit") = timed(2) {
        SpatialJoin.de9imAdaptive(triS, suppS, minPoints = 4,
          earlyExit = true).count() }
      val segDiff =
        SpatialJoin.de9imAdaptive(triS, suppS, minPoints = 4)
          .select(col("s_id"), col("t_id"), col("intersects"))
          .exceptAll(SpatialJoin.de9imAdaptive(triS, suppS, minPoints = 4,
            earlyExit = true)
            .select(col("s_id"), col("t_id"), col("intersects")))
          .count()
      // sp15's kNN at scale: supplier-box centroids probing the part
      // corpus (100k queries vs 2M targets at 100x) — the measured
      // curve for the grid+certificate+residual operator whose
      // exactness the sp15 gate and KnnJoinSpec prove
      def centroids(df: DataFrame, idc: String): DataFrame = df.select(
        col("id").as(idc),
        ((col("minx") + col("maxx")) / 2).as("x"),
        ((col("miny") + col("maxy")) / 2).as("y"))
      results("sp15_knn_join") = timed(2) {
        KnnJoin.knnJoin(centroids(suppS, "src_id"),
          centroids(partS, "tgt_id"), k = 3).count() }
      // sp15 on a HEAVILY CLUSTERED corpus: 95 % of targets squeezed
      // into 1 % of the domain area (coords/10), sources spread across
      // the full extent. The round-8 single-shot residual (uncertified
      // × ALL targets) made this shape its worst case; the round-9
      // expanding ring certifies each source once r·cellWidth passes
      // its kth-neighbor distance, so the curve must stay ~linear.
      // ids are STRINGS in the scaled frames ("12~3" copy suffixes) —
      // pick the kept-wide 5 % by hash, never by numeric cast
      val spreadTgt = pmod(xxhash64(col("tgt_id")), lit(20)) === 0
      val tgtClustered = centroids(partS, "tgt_id")
        .withColumn("x", when(spreadTgt, col("x")).otherwise(col("x") / 10))
        .withColumn("y", when(spreadTgt, col("y")).otherwise(col("y") / 10))
      results("sp15_knn_clustered") = timed(2) {
        KnnJoin.knnJoin(centroids(suppS, "src_id"), tgtClustered, k = 3)
          .count() }
      // sp16's ε-distance join on the same corpora: the g≥ε grid keeps
      // candidates ~ n·(targets/cells-touched) — the curve should track
      // output growth (pair density × corpus²), not the raw product
      results("sp16_distance_join") = timed(2) {
        DistanceJoin.distanceJoin(centroids(suppS, "src_id"),
          centroids(partS, "tgt_id"), radius = 5.0).count() }
      // dd15 includes the dd9 pointer-jumping CC over the dd5 pair
      // graph — the iterative-DataFrame scale shape, measured here for
      // the first time (r7); ann11 is ann8 + the bounded exact rerank.
      for (q <- Seq("dd5_lsh_pairs", "dd11_simhash_pairs",
                    "ann5_ivf_scaled", "ann8_ivfpq_topk",
                    "ann11_rerank_topk", "dd15_cluster_keeper",
                    "ann12_filtered_ivf", "ann13_range_banded",
                    // round-8 curation/selection family: shard-split
                    // top-K cap, per-source prefix-sum budget,
                    // broadcast-probe incremental dedup, DSIR weights
                    "cp3_domain_cap", "cp4_token_budget",
                    "dd17_incremental_dedup", "ta10_importance_weights",
                    // wave-3: temperature mix (broadcast-probe shape),
                    // Gopher rules (map-side), fuzzy contamination
                    // (dd5's banded shape over the shared sig cache)
                    "cp6_temperature_mix", "ta11_gopher_rules",
                    "dd18_fuzzy_contamination",
                    // round-9: the composed curation pipeline — the
                    // shuffle-ledger claim measured as one curve —
                    // and PMI collocations (two aggregates + broadcast
                    // joins; the curve should track token volume)
                    "cp7_full_curation", "ta12_pmi_bigrams",
                    // round-10: the 3-iteration Lloyd loop and its
                    // cluster-cap consumer (per-iteration broadcast
                    // assign + cell-key recompute; ~n × sqrt(n) narrow
                    // candidate rows per iteration) run BEFORE the two
                    // large text caches below exist; bigram-LM scoring
                    // (two model aggs + two key joins over the bigram
                    // stream — tracks token volume) and repeated-span
                    // detection (span explode + key-grouped dup table
                    // + semi-join; the substring-dedup family's scale
                    // shape) memoize corpus-token-sized frames
                    "ann14_kmeans_lloyd", "cp8_cluster_balance",
                    // ann15 rides ann14's memoized codebook+assignment:
                    // its marginal cost is the probe/rerank tail only
                    "ann15_ivf_learned",
                    "ta13_bigram_lm", "dd19_span_dedup",
                    // round-10 wave 2: containment dedup (inverted
                    // shingle index, hub-capped — the wedge volume is
                    // df-bounded, so the curve should track postings,
                    // not pairs) and multiprobe LSH (9 bucket probes
                    // per query over the signature equi-join)
                    "dd20_containment", "ann16_multiprobe_lsh"))
        results(q) = timed(2) { SparkEntry.queries(q)(spark, dataDir).count() }
      // round-10: 3-iteration PageRank over the N× interaction graph
      // (disjoint shifted copies of the sf-base customer–supplier
      // edges — the scaled dirs carry no TPC-H tables). Per-iteration
      // cost is edge-linear: rank join against the persisted
      // src-partitioned edge frame + dst-key partial agg; the curve
      // should track edge volume, the graph build is untimed.
      val ge = graft.spark.DfCache.memo(spark, s"scale#grEdges#$baseDir#$n") {
        ScaleCorpus.scaledEdges(spark,
          graft.operators.GraphOps.interactionEdges(spark, baseDir), n)
      }
      results("gr1_pagerank") = timed(2) {
        val gn = ge.select(col("src").as("id")).distinct()
        val gc = gn.count()
        graft.operators.GraphOps.pagerank(ge,
          gn.select(col("id"), lit(1.0 / gc.toDouble).as("w"))).count()
      }
      // round-10 wave 2 graph rows over the same scaled edge frame:
      // k-core rounds are a per-copy structural property (disjoint
      // shifted copies of one base graph), so the curve isolates
      // edge-volume cost; label propagation is 3 edge-sized joins.
      results("gr6_kcore") = timed(2) {
        graft.operators.GraphOps.kcore(ge, k = 30, maxRounds = 8).count()
      }
      results("gr7_label_prop") = timed(2) {
        graft.operators.GraphOps.labelPropagation(ge, rounds = 3).count()
      }
      // sp19 overlay measure over the scaled jittered boxes (double
      // areas — the integer-exact contract is gate-corpus-only)
      results("sp19_overlay_area") = timed(2) {
        SpatialJoin.overlayArea(partS, suppS).count()
      }
      // dd9/dd15's iterative-CC convergence curve: rounds should grow
      // ~log(max cluster diameter), not with corpus size — measured for
      // BOTH engines (pointer jumping and the alternating-star form)
      val ccEdges = graft.operators.TextOps.dd5LshPairs(spark, dataDir)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val (ccLabels, ccRounds) = graft.operators.Components
        .connectedComponentsWithStats(ccEdges)
      ccLabels.count()
      val (ccAltLabels, ccAltRounds) = graft.operators.Components
        .connectedComponentsAlternating(ccEdges)
      ccAltLabels.count()
      // dd5 at production signature width — the SAME gate operator
      // (TextOps.dd5LshPairs), wider signature: rows-per-band grown
      // with log n (r=4 to 100k docs, r=6 beyond; false-candidate rate
      // per band ~ J^r), band count fixed so recall stays 1-(1-J^r)^4.
      val docs = corpus("docs")
      val dd5Perms = if (docs <= 100000) 16 else 24
      results(s"dd5_wide_signature_$dd5Perms") = timed(2) {
        graft.operators.TextOps.dd5LshPairs(spark, dataDir,
          perms = dd5Perms, numBands = 4).count() }
      // dd8 gate width (8 planes / 4 bands = 2 bits/band, 4 bucket
      // values) is oracle-friendly but collides ~everything as n grows
      // (quadratic candidates, measured 48 s at 10×) — capped at 10×,
      // never silently: the wide form below carries the curve.
      val vecs = corpus("vecs")
      if (vecs <= 50000)
        results("dd8_lsh_embedding_dups") = timed(2) {
          SparkEntry.queries("dd8_lsh_embedding_dups")(spark, dataDir).count() }
      else println(s"[scale] skipping dd8_lsh_embedding_dups at n=$vecs: " +
        "gate-width signature (4 buckets/band) is quadratic past ~50k vectors")
      // dd8 at production signature width: since round 8 this IS the
      // gate operator (dd8_scaled_dups — 64-plane signature, banding
      // width corpus-branched inside the operator and its oracle), so
      // the curve below is the hash-gated form's curve, not a
      // harness-only variant.
      results("dd8_scaled_dups") = timed(2) {
        SparkEntry.queries("dd8_scaled_dups")(spark, dataDir).count() }

      // Streaming state-scale: the production FILE source (one
      // micro-batch per ts-ranged part file, parquet sink, no driver
      // replay) at EVERY scale — wall-time should track data volume,
      // state rows should track active users (sessionize) resp.
      // rate × window (interval join).
      val (st1Sec, st1Rows, st1State) =
        graft.streaming.EventStream.sessionizeFileStats(spark, dataDir)
      val (ij1Sec, ij1Rows, ij1State) =
        graft.streaming.EventStream.intervalJoinFileStats(spark, dataDir)
      val (sk1Sec, sk1Rows, sk1State) =
        graft.streaming.EventStream.sketchFileStats(spark, dataDir)
      // st10: the NATIVE session_window operator next to the custom
      // sessionizer's curve — same input, Spark's own session state
      val (sw1Sec, sw1Rows, sw1State) =
        graft.streaming.EventStream.sessionWindowFileStats(spark, dataDir)
      val (dr1Sec, dr1Rows, dr1State) =
        graft.streaming.EventStream.dailyRollupFileStats(spark, dataDir)
      // Same harnesses on the RocksDB state store — the provider a
      // 100 TB deployment runs (state spills beyond the executor heap;
      // the default HDFS-backed store is entirely on-heap), with the
      // tuning preset (EventStream.RocksDbTuning: changelog
      // checkpointing, 64 MB block cache, no compression, 64 MB write
      // buffer, row tracking off, sparse snapshots) applied by the
      // harness. Rows must match the in-memory run exactly; state_rows
      // reads 0 under the tuned preset (trackTotalNumberOfRows=false —
      // the documented cost of skipping the per-put existence lookup;
      // the in-memory twin of the same query carries the state curve).
      // The mem/rocks PAIR is interleaved min-of-2: host noise on this
      // box has swung single runs of the identical harness by 1.8×,
      // which once made the provider ratio read as 2.1× (r9).
      val rocks = Some(graft.streaming.EventStream.RocksDbProvider)
      val (st1rSec0, st1rRows, st1rState) =
        graft.streaming.EventStream.sessionizeFileStats(spark, dataDir, rocks)
      val (ij1rSec0, ij1rRows, ij1rState) =
        graft.streaming.EventStream.intervalJoinFileStats(spark, dataDir, rocks)
      val st1Sec2 = math.min(st1Sec,
        graft.streaming.EventStream.sessionizeFileStats(spark, dataDir)._1)
      val ij1Sec2 = math.min(ij1Sec,
        graft.streaming.EventStream.intervalJoinFileStats(spark, dataDir)._1)
      val st1rSec = math.min(st1rSec0,
        graft.streaming.EventStream.sessionizeFileStats(spark, dataDir, rocks)._1)
      val ij1rSec = math.min(ij1rSec0,
        graft.streaming.EventStream.intervalJoinFileStats(spark, dataDir, rocks)._1)
      // the hash-gated MemoryStream replay harnesses carry bounded
      // driver collects — run them to 10× (1M rows), never silently
      val events = Tables.events(spark, dataDir).count()
      val replayJson = if (events <= 1000000) {
        val s1 = new graft.streaming.EventStream.ReplayStats
        val t1 = timed(1) { graft.streaming.EventStream
          .sessionizeGate(spark, dataDir, Some(s1)).count() }
        val s2 = new graft.streaming.EventStream.ReplayStats
        val t2 = timed(1) { graft.streaming.EventStream
          .intervalJoinGate(spark, dataDir, Some(s2)).count() }
        f""","st1_replay":{"sec":${t1._1}%.3f,"rows":${t1._2},"state_rows":${s1.maxStateRows}},""" +
        f""""st2_replay":{"sec":${t2._1}%.3f,"rows":${t2._2},"state_rows":${s2.maxStateRows}}"""
      } else {
        println(s"[scale] skipping st1/st2 MemoryStream replay at n=$events: " +
          "driver-collect harness capped at 1M events (file-source stats cover the scale)")
        ""
      }

      // A6 per-partition stats over the batch join: hot-spot proof
      val (counted, stats) = SpatialJoin.de9imWithStats(partS, suppS)
      counted.count()
      val verifs = stats.values.map(_.verifications.toDouble).toSeq
      val a6 =
        if (verifs.isEmpty) """"parts":0"""
        else {
          val mean = verifs.sum / verifs.size
          val cv = math.sqrt(verifs.map(v => (v - mean) * (v - mean)).sum /
            verifs.size) / math.max(mean, 1e-9)
          f""""parts":${verifs.size},"total_verifs":${verifs.sum.toLong},""" +
          f""""max_verifs":${verifs.max.toLong},"mean_verifs":${mean}%.1f,""" +
          f""""cv":${cv}%.3f,"max_part_ms":${stats.values.map(_.wallMillis).max}%.1f"""
        }

      val qjson = results.map { case (k, (s, _)) => f""""$k":$s%.3f""" }.mkString(",")
      val rjson = results.map { case (k, (_, r)) => s""""$k":$r""" }.mkString(",")
      val cjson = corpus.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val streamJson =
        f""""st1_file":{"sec":$st1Sec2%.3f,"rows":$st1Rows,"state_rows":$st1State},""" +
        f""""st2_file":{"sec":$ij1Sec2%.3f,"rows":$ij1Rows,"state_rows":$ij1State},""" +
        f""""st5_file":{"sec":$sk1Sec%.3f,"rows":$sk1Rows,"state_rows":$sk1State},""" +
        f""""st10_file":{"sec":$sw1Sec%.3f,"rows":$sw1Rows,"state_rows":$sw1State},""" +
        f""""st8_file":{"sec":$dr1Sec%.3f,"rows":$dr1Rows,"state_rows":$dr1State},""" +
        f""""st1_file_rocksdb":{"sec":$st1rSec%.3f,"rows":$st1rRows,"state_rows":$st1rState},""" +
        f""""st2_file_rocksdb":{"sec":$ij1rSec%.3f,"rows":$ij1rRows,"state_rows":$ij1rState}""" +
        replayJson
      println(s"""{"scale":$n,"base":"$baseDir","seg_intersects_diff":$segDiff,""" +
        s""""cc_rounds":$ccRounds,"cc_alt_rounds":$ccAltRounds,"events":$events,""" +
        s""""corpus":{$cjson},"sec":{$qjson},"rows":{$rjson},""" +
        s""""stream":{$streamJson},"a6":{$a6}}""")
      graft.spark.DfCache.release(spark)
    }
    spark.stop()
  }
}

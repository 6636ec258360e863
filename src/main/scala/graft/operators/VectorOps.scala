package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]`
  * column). Brute-force cosine top-k is the exact baseline; the
  * LSH-bucketed variant is the 100 TB path (candidates per bucket, not
  * all-pairs). Dot products use the built-in higher-order functions
  * (`zip_with` + `aggregate`) over double-cast arrays — codegen'd, no
  * UDF, and deterministic left-to-right accumulation that DuckDB's
  * list functions reproduce exactly.
  */
object VectorOps {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Native primitive-loop cosine (see [[graft.functions.ArrCosineSim]]). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.arr_cosine(a, b)

  /** Raw dot product via codegen'd HOFs — deterministic left-to-right
    * accumulation, matching DuckDB's `list_dot_product` order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ann1: exact top-5 neighbours (cosine) for every 50th vector.
    * Query side is tiny → broadcast; candidate side streams. Ranking
    * uses the similarity rounded to 9 decimals so order is stable
    * across engines' last-ulp differences, with vec_id as tie-break. */
  def ann1CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.spark.Spread(embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val sim = round(cosine(col("q_v"), col("v")), 9)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann2: label centroids — mean vector per label (the IVF coarse
    * quantizer's training step; also a correctness check on
    * elementwise array aggregation). Output one row per (label, dim). */
  def ann2LabelCentroids(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select(col("label"), posexplode(asDouble(col("embedding"))))
      .groupBy(col("label"), col("pos").as("dim"))
      .agg(round(avg(col("col")), 9).as("centroid"))
      .select(col("label"), col("dim"), col("centroid"))
      .orderBy(col("label"), col("dim"))

  /** ann3: IVF self-search — assign EVERY vector to its cell and rank
    * the top-3 neighbours within the cell (the all-vectors batch form
    * of IVF, vs ann5's sampled-query probe form). The codebook is the
    * same sqrt-scaled Lloyd training as ann5 at a SECOND cell count —
    * ceil(sqrt(n))/2 centroids — so the cell-key cardinality grows
    * with the corpus (the round-3..6 "8-label cells collapse in-cell
    * parallelism" weak is retired) and the two gate rows together
    * demonstrate the codebook size is a free parameter of one code
    * path. Both argmins order by the similarity rounded to 9 decimals
    * with an id tie-break, so the result is stable across engines'
    * last-ulp float differences and has an exact DuckDB oracle. */
  def ann3IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = embVectors(s, dir)
    val trained = ivfCodebook(s, dir, "ann3cents",
      n => math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt / 2))
    // both self-join arms read the assignment — session-cached so the
    // crossJoin + argmin window runs once, not once per arm
    val assigned = graft.spark.DfCache.memo(s, s"$dir#ann3assigned") {
      ivfAssign(emb, trained)
    }
    val l = assigned.select(col("cell"), col("vec_id").as("q_id"), col("v").as("q_v"))
    val r = assigned.select(col("cell"), col("vec_id").as("n_id"), col("v").as("n_v"))
    l.join(r, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_v"), col("n_v")), 9))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann5: SCALE-READY IVF, sampled-probe form — the codebook is
    * k = ceil(sqrt(n)) centroids trained by one distributed Lloyd
    * iteration over deterministic seed vectors (every floor(n/k)-th
    * vec_id), so cell-key cardinality GROWS with the corpus and in-cell
    * candidate work per query is nprobe * n/k. The centroid table is
    * O(sqrt n) rows — broadcast for both assignment and query probing;
    * the only shuffle is the per-cell equi-join. Deterministic seeds
    * (every floor(n/k)-th vec_id) + exactly ONE Lloyd step + argmin
    * assignment make the whole training SQL-expressible, so the gate
    * entry has an exact DuckDB oracle (seeds CTE → assign via
    * row_number over rounded cosine → avg per cell → reassign →
    * probe); the exactness property (nprobe = k recovers brute force)
    * is additionally spec-verified. */
  private def embVectors(s: SparkSession, dir: String): DataFrame =
    // spread before the double-cast projection (round 15): the
    // embeddings table is a single-row-group scan (1 partition), and
    // every brute/assignment arm below does per-row cosine work with
    // no exchange underneath — serial on a 32-core session without
    // this (dd7's twin measured 2.43 s -> 0.71 s). No-op on scans
    // that already carry >= defaultParallelism partitions.
    graft.spark.Spread(embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Argmin cell assignment against a broadcast centroid table.
    *
    * The argmin's sort/window input is NARROW — (vec_id, csim, cell),
    * ~24 B/row — with the winning row's vector joined back afterwards
    * (the SpatialJoin narrow-rows doctrine): the n × k candidate rows
    * are the one data-proportional intermediate in every IVF path, and
    * carrying the 64-dim vector through them made the 100× k-means
    * sort ~50 GB (OOM under cache pressure) where the narrow form is
    * ~2 GB. The rejoin touches only n rows on the vec_id key. */
  private def ivfAssign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        round(cosine(col("v"), col("c_v")), 9).as("csim"), col("cell"))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("cell"))
      .join(emb, Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("cell"))

  /** IVF codebook at a caller-chosen cell count: deterministic seeds
    * (every floor(n/nc)-th vec_id) + one Lloyd step, session-memoized
    * under `key`. `ncOf` maps corpus size to codebook cardinality —
    * ann5/ann8 use ceil(sqrt(n)); ann3 half that — so cell counts GROW
    * with the corpus at every gate entry. */
  /** One Lloyd mean-recompute over an assignment frame (cell, v):
    * per-dim means rounded to 9 (so both engines' last-ulp summation
    * drift collapses to the same value), reassembled into the centroid
    * vector. Cells that lost every member drop out — standard Lloyd. */
  private def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => round(p("m"), 9)).as("c_v"))

  private def ivfCodebook(s: SparkSession, dir: String, key: String,
                          ncOf: Long => Int): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#$key") {
      val emb = embVectors(s, dir)
      val n = emb.count()
      val nc = ncOf(n)
      val step = math.max(1L, n / nc)
      val seeds = emb.filter(col("vec_id") % step === 0)
        .select(col("vec_id").as("cell"), col("v").as("c_v"))
      recenter(ivfAssign(emb, seeds))
    }

  /** ann14: full multi-iteration distributed Lloyd k-means — the
    * training loop the one-step IVF codebooks (ann3/ann5) truncate.
    * Each iteration is the canonical two-step: argmin assignment
    * against the BROADCAST centroid table (k = ceil(sqrt n) rows, so
    * the per-iteration shuffle is only the recompute's partial agg on
    * the cell key — the corpus itself is never re-shuffled), then
    * per-dim mean recompute. Rounding the means to 9 decimals each
    * iteration makes the whole trajectory deterministic across
    * engines — iteration i+1's assignment sees bit-identical centroids
    * in Spark and DuckDB — so a 3-iteration run has an exact unrolled
    * SQL oracle. Emits the final codebook row-per-dim with cluster
    * sizes; signed-zero canonicalized (+ 0.0) because near-orthogonal
    * dims can average to ±0.0. The k-means loop is the standard scale
    * shape for embedding-space data curation (cluster-balanced
    * sampling, SemDeDup cells, IVF training). */
  /** The ann14 codebook after `iters` full Lloyd iterations,
    * session-memoized — shared by the ann14 gate and the cp8
    * cluster-balanced selection. */
  private def kmeansCodebook(s: SparkSession, dir: String,
                             iters: Int): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#ann14cv#$iters") {
      val emb = embVectors(s, dir)
      val n = emb.count()
      val nc = math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt)
      val step = math.max(1L, n / nc)
      var cents = emb.filter(col("vec_id") % step === 0)
        .select(col("vec_id").as("cell"), col("v").as("c_v"))
      for (_ <- 1 to iters)
        cents = recenter(ivfAssign(emb, cents))
      cents
    }

  def ann14KmeansLloyd(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val cents = kmeansCodebook(s, dir, iters)
    val sizes = kmeansAssigned(s, dir, iters)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    cents.join(sizes, Seq("cell"))
      .select(col("cell"), col("n_members"), posexplode(col("c_v")))
      .select(col("cell"), col("n_members"), col("pos").as("dim"),
        (col("col") + lit(0.0)).as("c_m"))
      .orderBy(col("cell"), col("dim"))
  }

  /** cp8: cluster-balanced selection — the embedding-space analogue of
    * cp3's per-domain cap: cap every LEARNED cluster (the ann14
    * codebook's cells) at `cap` vectors, chosen in deterministic
    * md5(vec_id) order — an i.i.d.-ish per-cluster quota. Where cp3/cp6
    * balance on a metadata column (source, lang), this balances on
    * structure the model discovered in embedding space, the standard
    * move when a corpus has no trustworthy domain labels (or the labels
    * hide skew the embeddings expose). The per-cell window is
    * scale-correct — cell count grows as sqrt(n) with the corpus, so
    * per-task input is ~n/sqrt(n) and parallelism GROWS at 100 TB
    * (unlike a metadata column's fixed domain, the q18 funnel class);
    * assignment is the same broadcast argmin every IVF path uses. */
  /** Full corpus assignment against the `iters`-iteration Lloyd
    * codebook, session-memoized — ONE broadcast-argmin pass (the
    * n × √n-row candidate sort) serves ann14's cluster sizes, cp8's
    * capped selection, and ann15's candidate cells. */
  private def kmeansAssigned(s: SparkSession, dir: String,
                             iters: Int = 3): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#ann14asgn#$iters") {
      ivfAssign(embVectors(s, dir), kmeansCodebook(s, dir, iters))
    }

  def cp8ClusterBalance(s: SparkSession, dir: String, cap: Int = 20): DataFrame = {
    kmeansAssigned(s, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))))
      .filter(col("rk") <= cap)
      .select(col("vec_id"), col("cell"), col("rk"))
      .orderBy(col("cell"), col("rk"))
  }

  /** The ann5 IVF codebook: ceil(sqrt(n)) cells (shared by ann5 and
    * the ann8 composition). */
  private def ivfTrained(s: SparkSession, dir: String): DataFrame =
    ivfCodebook(s, dir, "ann5cents",
      n => math.max(2, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Top-nprobe cells per query vector (every `qStride`th vec_id —
    * 50 is the gate contract; Scale passes 50·n so the query SAMPLE
    * stays fixed-size while the corpus grows, the production shape). */
  private def ivfProbe(emb: DataFrame, trained: DataFrame,
                       nprobe: Int, qStride: Long = 50L): DataFrame =
    emb.filter(col("vec_id") % qStride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
      .crossJoin(broadcast(trained))
      .withColumn("csim", round(cosine(col("q_v"), col("c_v")), 9))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cell").asc)))
      .filter(col("crk") <= nprobe)
      .select(col("q_id"), col("q_v"), col("cell"))

  /** The IVF serve path shared by ann5 and ann15: probe the top-nprobe
    * cells per query, join candidates on the cell key, exact-cosine
    * rerank, top-k. One tail, two codebooks — a tie-break or rounding
    * fix lands in both gates (and both oracles mirror this exact
    * sequence). */
  private def ivfSearch(emb: DataFrame, trained: DataFrame,
                        assigned: DataFrame, k: Int, nprobe: Int,
                        qStride: Long = 50L): DataFrame =
    ivfProbe(emb, trained, nprobe, qStride)
      .join(assigned.select(col("cell"), col("vec_id").as("n_id"),
        col("v").as("n_v")), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", round(cosine(col("q_v"), col("n_v")), 9))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))

  def ann5IvfScaled(s: SparkSession, dir: String, k: Int = 3,
                    nprobe: Int = 4, qStride: Long = 50L): DataFrame = {
    val emb = embVectors(s, dir)
    val trained = ivfTrained(s, dir)
    ivfSearch(emb, trained, ivfAssign(emb, trained), k, nprobe, qStride)
  }

  /** ann15: IVF search over the LEARNED codebook — ann5's sampled-probe
    * search served from the fully-trained ann14 Lloyd centroids
    * (3 iterations) instead of the one-step codebook. This is the
    * production composition (train the codebook once, serve every
    * probe from it) and the quality rung above ann5: better-centered
    * cells concentrate true neighbors into fewer probed cells, so the
    * same nprobe recalls more. Cell count, probe width and ranking
    * arithmetic are ann5's; the codebook — and thus the oracle's CTE
    * prefix — is ann14's, so two proven chains compose with no new
    * math. Scale shape is unchanged: broadcast codebook argmin,
    * cell-key candidate join, never all-pairs. */
  def ann15IvfLearned(s: SparkSession, dir: String, k: Int = 3,
                      nprobe: Int = 4): DataFrame =
    ivfSearch(embVectors(s, dir), kmeansCodebook(s, dir, 3),
      kmeansAssigned(s, dir), k, nprobe)

  /** ann17: kNN-GRAPH construction — every corpus vector's top-k
    * cosine neighbors among its OWN Lloyd cell's members (the ann14
    * codebook, memoized assignment shared with ann14/ann15/cp8). Where
    * the ann* search gates answer queries, this materializes the
    * corpus-wide neighbor graph itself — the input artifact of
    * SemDeDup-style semantic dedup, graph clustering (gr7 over
    * embedding space), and diversity-aware curation.
    *
    * 100 TB shape: the candidate space is the per-cell self-join —
    * with ceil(sqrt n) trained cells the per-cell membership is ~√n,
    * so candidate volume is n·√n, never n² (the dd14 bound, here with
    * the FULL Lloyd codebook so cells are tighter). The top-k window
    * runs on a NARROW (src, nbr, sim) projection — vectors are
    * dropped the moment the cosine is computed (the ivfAssign
    * narrow-rows doctrine) — and partitions by src_id, whose
    * cardinality grows with the corpus. In-cell truncation is the
    * accepted ANN trade-off (a neighbor in an adjacent cell is
    * missed); the exact twin at gate scale is dd7's quadratic form. */
  def ann17KnnGraph(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val cells = kmeansAssigned(s, dir)
    val a = cells.select(col("cell"), col("vec_id").as("src_id"),
      col("v").as("src_v"))
    val b = cells.select(col("cell"), col("vec_id").as("nbr_id"),
      col("v").as("nbr_v"))
    a.join(b, "cell")
      .filter(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        round(cosine(col("src_v"), col("nbr_v")), 9).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("sim").desc, col("nbr_id").asc)))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("nbr_id"), col("sim"), col("rank"))
      .orderBy(col("src_id"), col("rank"))
  }

  /** ann17's edge list (src_id, nbr_id), session-memoized — the graph
    * artifact ann21 serves from (built once, searched many times: the
    * production contract of a graph index). */
  private[graft] def knnGraphEdges(s: SparkSession, dir: String,
                                   degree: Int = 8): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#ann21edges#$degree") {
      ann17KnnGraph(s, dir, k = degree).select(col("src_id"), col("nbr_id"))
    }

  /** ann21: GRAPH-TRAVERSAL ANN SERVING — deterministic beam search
    * over ann17's kNN graph (the HNSW/Vamana serving idea, public
    * algorithms, instantiated as bounded synchronous rounds so the
    * whole search replays as SQL): entries are the learned-codebook
    * IVF probe's top-3 for the query (see [[ann21Entries]] — the
    * coarse-quantizer entry every production graph index uses, and
    * what makes beam recall ≥ IVF recall by construction); each of
    * the 3 unrolled hops expands the beam along the graph's out-edges
    * (degree 8 — the r13 k=3 serving graph was too sparse to beat the
    * probe path), re-scores every candidate by exact cosine to the
    * query, and keeps the top-8 by (sim, id) — the beam always
    * contains its predecessor set, so best-so-far is monotone. The
    * gated payload is recall@k against ann18's brute ground truth —
    * index CONSTRUCTION (ann17) and index SERVING (ann21) sign-off
    * rows side by side.
    *
    * 100 TB shape: per-round cost is |queries|·beam edge-key lookups
    * plus a beam-sized window per query — the corpus is touched only
    * through the prebuilt edge frame and the candidate-keyed vector
    * join; nothing corpus-wide shuffles per query. The brute arm is
    * the metric's definition (the ann18 argument: fixed query sample
    * broadcast against one scan). */
  /** The deterministic beam entries per query: the ann5 IVF probe's
    * own top-3 at the query stride — the standard HNSW/Vamana trick of
    * entering the graph from a coarse quantizer's result, and the
    * round-14 fix for the r13 sign-off gap: min-id members of the
    * top-2 cells entered the graph at arbitrary (low-sim) vectors, and
    * because ann17's edges never leave their Lloyd cell the beam could
    * not recover — recall@3 0.233/0.300 (degree 3/8) vs the IVF
    * probe's 0.400. Entering AT the top-k of the SAME IVF ann18 signs
    * off makes the beam's final exact-cosine candidate set a superset
    * of ann18's result, so beam recall ≥ IVF recall BY CONSTRUCTION at
    * every scale (a ground-truth hit in the candidate set outranks
    * every non-hit by definition of ground truth, under the shared
    * (sim desc, id asc) tiebreak), and the graph hops then add in-cell
    * neighbors the probe's rank cutoff missed.
    * Exposed package-side for the Round13Spec single-hop contract. */
  private[graft] def ann21Entries(s: SparkSession, dir: String,
      qStride: Long = 50L): DataFrame =
    ann5IvfScaled(s, dir, k = 3, qStride = qStride)
      .select(col("q_id"), col("n_id").as("cand"))

  /** The final scored candidate frame (q_id, cand, sim) after `hops`
    * beam rounds — the loop body ann21BeamRecall ranks from. */
  private[graft] def ann21Scored(s: SparkSession, dir: String,
      beam: Int = 8, hops: Int = 3, qStride: Long = 50L,
      degree: Int = 8): DataFrame = {
    val emb = embVectors(s, dir)
    val q = emb.filter(col("vec_id") % qStride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val edges = knnGraphEdges(s, dir, degree)
    val corpus = emb.select(col("vec_id").as("cand"), col("v").as("cand_v"))
    var beamSet = ann21Entries(s, dir, qStride)
    var scored: DataFrame = null
    for (hop <- 1 to hops) {
      val expanded = beamSet.join(edges, beamSet("cand") === edges("src_id"))
        .select(col("q_id"), col("nbr_id").as("cand"))
      val cands = beamSet.unionByName(expanded).distinct()
      scored = cands.join(q, "q_id").join(corpus, "cand")
        .filter(col("cand") =!= col("q_id"))
        .select(col("q_id"), col("cand"),
          round(cosine(col("q_v"), col("cand_v")), 9).as("sim"))
      // Lineage-cut every beam round (round 15 — the standing iterative-
      // loop doctrine finally applied here): beamSet_h is referenced
      // TWICE by hop h+1 (the edge expansion and the candidate union),
      // so without a cut the plan doubles per hop — 3 hops embedded 2^3
      // copies of the whole ann5 entry chain (54 joins, a 6 MB explain,
      // and ~every stage re-planned by AQE). The frame is |queries|·beam
      // rows, so the cut is microseconds of storage; the per-hop window
      // and joins are unchanged. Skipped after the LAST hop: `scored`
      // is the returned frame — its consumer ranks it, and cutting it
      // would hide the final hop's cost from the measured plan.
      if (hop < hops)
        beamSet = graft.spark.Checkpoints.cut(
          scored.withColumn("rk", row_number().over(
              Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cand").asc)))
            .filter(col("rk") <= beam)
            .select(col("q_id"), col("cand")),
          None)
    }
    scored
  }

  def ann21BeamRecall(s: SparkSession, dir: String, k: Int = 3,
      beam: Int = 8, hops: Int = 3, qStride: Long = 50L,
      degree: Int = 8): DataFrame = {
    val beamTopK = ann21Scored(s, dir, beam, hops, qStride, degree)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("cand").asc)))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand").as("n_id"))
    recallVsBrute(s, dir, k, qStride, beamTopK)
  }

  /** ann18: RECALL@k evaluation of the IVF search as a driver-gated
    * fact — per query, how many of the exact brute-force top-k the
    * ann5 probe path actually returned. Quality metrics as data (the
    * pr11 pattern applied to ANN): the standard way an embedding
    * platform signs off an index configuration before serving it.
    * Output per query: (q_id, k, n_hits, recall); n_hits is an exact
    * integer (set intersection of two deterministic top-k lists) and
    * recall is one IEEE division, so the gate is hash-exact.
    *
    * Scale: the IVF arm is the bounded ann5 path; the brute arm is an
    * exact scan BY DEFINITION of the metric (you cannot measure recall
    * without ground truth) and scales by query-set size — on a real
    * corpus the query sample is fixed (here every 50th vector), so the
    * brute side is a broadcast of the sample against one corpus scan,
    * the ann1 whitelisted shape. */
  /** Exact brute-force top-k ground truth per sampled query — the
    * by-definition-exact arm every recall evaluation needs (ann18's
    * brute construction, factored so ann21 cannot drift from it):
    * fixed query sample broadcast against one corpus scan. */
  private def bruteTopK(s: SparkSession, dir: String, k: Int,
                        qStride: Long): DataFrame = {
    val emb = embVectors(s, dir)
    val q = emb.filter(col("vec_id") % qStride === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(col("q_v"), col("v")), 9).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"))
  }

  /** recall@k of a (q_id, n_id) result set against the brute ground
    * truth — the pr11-style quality payload shared by ann18/ann21. */
  private def recallVsBrute(s: SparkSession, dir: String, k: Int,
                            qStride: Long, result: DataFrame): DataFrame =
    bruteTopK(s, dir, k, qStride)
      .join(result.withColumn("hit", lit(1)), Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .select(col("q_id"), lit(k).as("k"), col("n_hits"),
        (col("n_hits") / lit(k)).as("recall"))
      .orderBy(col("q_id"))

  def ann18RecallEval(s: SparkSession, dir: String, k: Int = 3,
                      qStride: Long = 50L): DataFrame =
    recallVsBrute(s, dir, k, qStride,
      ann5IvfScaled(s, dir, k, qStride = qStride)
        .select(col("q_id"), col("n_id")))

  /** dd7: embedding-cosine near-duplicates — vector pairs whose cosine
    * exceeds a data-calibrated threshold (this synthetic corpus tops
    * out near 0.51, so 0.45 marks its "near-duplicate" tail; rounded
    * for cross-engine stability). Exact quadratic form here; the
    * LSH-bucketed scale path is ann4. */
  def dd7EmbeddingDups(s: SparkSession, dir: String): DataFrame = {
    val emb = graft.spark.Spread(embeddings(s, dir))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("sim") >= 0.45)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Deterministic pseudo-random integer plane weights in
    * [-1e6, 1e6], derived from md5(plane:dim) — shared between the
    * Spark signature and the DuckDB oracle literal. */
  private[operators] def planeWeights(planes: Int, dims: Int): Array[Array[Long]] =
    Array.tabulate(planes, dims) { (j, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2000001L - 1000000L
    }

  /** Random-hyperplane signature assignment — the sublinear candidate
    * path for cosine similarity at scale.
    *
    * Integer-exact by construction: embeddings are quantized with
    * `floor(x*1000)` (floor of a shared IEEE double — no rounding-rule
    * hazards across engines) and dotted against integer plane weights;
    * every partial sum stays < 2^53, so the signature is bit-identical
    * in Spark and DuckDB and the bucket histogram has an exact oracle.
    * Quantized-input hyperplane LSH is still genuine cosine LSH — the
    * planes are random, only the input grid is 1e-3. */
  def hyperplaneBuckets(s: SparkSession, dir: String, planes: Int = 8): DataFrame = {
    val dims = 64
    val w = planeWeights(planes, dims)
    val wLit = typedLit(w.map(_.toSeq).toSeq)
    val emb = embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("q", transform(col("v"), x => floor(x * 1000).cast("long")))
      .withColumn("planes", wLit)
    val sigBit = (j: Int) => when(
      aggregate(zip_with(col("q"), element_at(col("planes"), j + 1),
        (x, y) => x * y), lit(0L), (acc, x) => acc + x) > 0, 1L << j).otherwise(0L)
    val sig = (0 until planes).map(sigBit).reduce(_ + _)
    emb.withColumn("sig", sig).select(col("vec_id"), col("sig"), col("v"))
  }

  /** dd8: LSH-verified embedding dedup — the bucketed form of dd7:
    * hyperplane signatures generate candidates, exact cosine verifies.
    * The 8-plane signature is BANDED (4 bands x 2 planes, the dd5
    * MinHash-LSH scheme): a pair is a candidate when ANY band matches,
    * so recall for a pair at cosine angle theta is 1-(1-p^2)^4 with
    * p = 1-theta/pi (~0.9 at sim 0.45) instead of the p^8 (~3%) an
    * all-8-bits-must-match signature gives. Candidate generation is a
    * narrow (vec_id, band, bsig) equi-join — cost bounded by band
    * bucket sizes, never all-pairs — and the 64-double vectors join
    * back only for candidate verification. dd7's quadratic form
    * remains as the exact baseline/test oracle. */
  def lshCandidatePairs(s: SparkSession, dir: String, planes: Int = 8,
                        bands: Int = 4, minSim: Double = 0.45): DataFrame = {
    val rpb = planes / bands // planes (bits) per band
    // both join arms read the signatures — session-cached so the
    // quantize + plane dot products run once, not once per arm
    val bucketed = graft.spark.DfCache.memo(s, s"$dir#hyperplane$planes") {
      hyperplaneBuckets(s, dir, planes)
    }
    verifyCosinePairs(bucketed,
      Banding.candidates(bucketed, "vec_id", "sig", bands, rpb), minSim)
  }

  /** Exact-cosine verification of a candidate pair list against the
    * memoized signature table's full-width vectors — shared by the
    * dd8 gate widths. Full vectors join back ONLY for candidates. */
  private def verifyCosinePairs(bucketed: DataFrame, cand: DataFrame,
                                minSim: Double): DataFrame = {
    val va = bucketed.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val vb = bucketed.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("sim", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Corpus-adaptive banding width for the 64-plane signature —
    * (bands, bitsPerBand): candidate volume grows ~n²/2^bits per
    * band, so bits must grow ~2·log2 of the corpus growth to keep
    * per-unit cost flat (same law dd5 follows by growing
    * rows-per-band, `TextOps.dd5LshPairs`). Measured on the 200k-row
    * 100× corpus: 12 bits → 35M candidates (67.9 s, SCALING_r08's
    * first cut), 14 bits → 8.0M, 16 bits → 2.5M. Schedule: ≤100k
    * vectors 8×8 (256 buckets/band), ≤400k 4×14, beyond 4×16 (all 64
    * planes). Recall at 4×14 for a true near-dup (plane agreement
    * p≈0.95) is 1-(1-p^14)^4 ≈ 0.93 — the recall cost of flat scaling
    * is a few points, the alternative is the measured quadratic. All
    * branches are one code path over ONE signature family — plane j's
    * weights are md5(j:dim)-derived independent of the total plane
    * count, so the branch only changes how the packed long is sliced. */
  private[operators] def dd8WidthFor(n: Long): (Int, Int) =
    if (n <= 100000L) (8, 8) else if (n <= 400000L) (4, 14) else (4, 16)

  /** The shared 64-plane signature table (memoized: quantize + 64
    * integer plane dots run once per session per corpus). */
  private def sig64(s: SparkSession, dir: String): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#hyperplane64") {
      hyperplaneBuckets(s, dir, 64)
    }

  /** dd8_scaled: the PRODUCTION-width form of [[lshCandidatePairs]] —
    * the same banded-candidates + exact-verify pipeline, with the
    * banding width chosen from the corpus size ([[dd8WidthFor]]) the
    * way a real deployment tunes LSH. The narrow (8-plane/4-band)
    * gate form collides ~everything past ~50k vectors (quadratic
    * candidates, measured 48 s at 10× in SCALING_r07); this form's
    * candidate volume is bounded by 2^bits-bucket band sizes at every
    * scale. The DuckDB oracle carries the SAME corpus-size branch, so
    * the gate stays hash-exact on either side of the 100k threshold. */
  def dd8ScaledDups(s: SparkSession, dir: String,
                    minSim: Double = 0.45): DataFrame = {
    val bucketed = sig64(s, dir)
    val (bands, bits) = dd8WidthFor(embVectors(s, dir).count())
    verifyCosinePairs(bucketed,
      Banding.candidates(bucketed, "vec_id", "sig", bands, bits), minSim)
  }

  /** ann12: filtered vector search, BOUNDED form — the IVF probe
    * (ann5's candidate bounding) composed with the metadata predicate:
    * per-query candidates are the members of the nprobe probed cells
    * whose label matches the query's, ranked by exact cosine. The
    * filter lands on the cell-bounded candidate list BEFORE ranking —
    * per-query work stays nprobe × n/√n, never a corpus scan — which
    * is the scale path the exact-scan ann9 gate oracle-pins the verify
    * step of. Oracle: the proven ann5 CTE chain + the label equi-join. */
  def ann12FilteredIvf(s: SparkSession, dir: String, k: Int = 3,
                       nprobe: Int = 4): DataFrame = {
    val emb = embVectors(s, dir)
    val labels = embeddings(s, dir).select(col("vec_id"), col("label"))
    val trained = ivfTrained(s, dir)
    val members = ivfAssign(emb, trained)
      .join(labels, "vec_id")
      .select(col("cell"), col("vec_id").as("n_id"), col("v").as("n_v"),
        col("label").as("n_label"))
    val probed = ivfProbe(emb, trained, nprobe)
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")),
        "q_id")
    probed.join(members, "cell")
      .filter(col("q_id") =!= col("n_id") && col("n_label") === col("q_label"))
      .withColumn("sim", round(cosine(col("q_v"), col("n_v")), 9))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann13: range (radius) search, BOUNDED form — banded-hyperplane
    * candidate generation at the [[dd8WidthFor]] production width,
    * probe-side asymmetric (the query rows' bands join the corpus
    * bands — the left arm is 1/50th of the data, never the full table
    * twice), then exact-cosine τ-verify. This is the scale path the
    * exact-scan ann10 gate oracle-pins the verify step of: τ maps to
    * the banding width (lower τ → fewer bits per band for recall;
    * this gate pins ann10's τ=0.30 at the production width, trading
    * recall for the candidate bound — the documented LSH contract;
    * recall-complete retrieval at any τ remains the exact ann10). */
  def ann13RangeBanded(s: SparkSession, dir: String,
                       tau: Double = 0.30): DataFrame = {
    val bucketed = sig64(s, dir)
    val (bands, bits) = dd8WidthFor(embVectors(s, dir).count())
    val cand = Banding.probeCandidates(bucketed, "vec_id", "sig", bands, bits,
      col("vec_id") % 50 === 0)
    val qv = bucketed.select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val nv = bucketed.select(col("vec_id").as("n_id"), col("v").as("n_v"))
    cand.join(qv, "q_id").join(nv, "n_id")
      .withColumn("sim", round(cosine(col("q_v"), col("n_v")), 9))
      .filter(col("sim") >= tau)
      .select(col("q_id"), col("n_id"), col("sim"))
      .orderBy(col("q_id"), col("n_id"))
  }

  /** ann4: hyperplane-LSH bucket histogram — signature sizes
    * demonstrate the bucketing; integer-exact signature (see
    * [[hyperplaneBuckets]]) makes the oracle exact. */
  def ann4HyperplaneLsh(s: SparkSession, dir: String): DataFrame =
    hyperplaneBuckets(s, dir)
      .groupBy(col("sig")).agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("sig"))

  /** ann16: MULTIPROBE hyperplane LSH top-k (Lv et al. 2007, public) —
    * each query probes its own signature bucket PLUS every
    * Hamming-distance-1 bucket (flip each of the 8 plane bits), so
    * recall rises the way extra hash tables would WITHOUT storing the
    * corpus more than once: near-miss neighbors that landed one plane
    * away become candidates. Candidate generation stays a narrow
    * equi-join on the signature key — cost = Σ probed-bucket sizes
    * (9 buckets/query), never all-pairs; a corpus vector has exactly
    * ONE signature, so no (query, neighbor) pair can arrive via two
    * probes and the join needs no dedup. Exact cosine verifies, ann6's
    * round-9 + id tie-break ranks. */
  def ann16MultiprobeLsh(s: SparkSession, dir: String, k: Int = 3,
                         planes: Int = 8): DataFrame = {
    val b = graft.spark.DfCache.memo(s, s"$dir#hpb$planes") {
      hyperplaneBuckets(s, dir, planes)
    }
    val probes = col("sig") +:
      (0 until planes).map(j => col("sig").bitwiseXOR(lit(1L << j)))
    val queries = b.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        explode(array(probes: _*)).as("probe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    b.join(broadcast(queries), col("sig") === col("probe"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(col("q_v"), col("v")), 9).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann6: int8 scalar-quantized cosine top-k — the standard 4×
    * memory-compression step of a large-scale embedding store: each
    * vector is quantized to integers in [-127, 127] with a per-vector
    * scale (max-abs), and search ranks by the cosine of the QUANTIZED
    * vectors. Quantization uses floor(x·127/s + 0.5) — identical IEEE
    * ops in both engines, no round-half rule in sight — so the whole
    * query has an exact oracle. Plan shape mirrors ann1 (documented
    * exact scan over the compressed column; broadcast 2% query side);
    * the candidate-bounded paths remain ann3/ann5/dd8 — quantization
    * composes with any of them, it changes bytes-per-vector, not the
    * plan. */
  /** The int8 scalar-quantized corpus (vec_id, q), session-memoized —
    * shared by ann6 (search over quantized vectors) and ann20 (the
    * fidelity audit of the same quantization). */
  private def sq8(s: SparkSession, dir: String): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#sq8") {
      // hoist the max-abs scale into its own column: inlining it in
      // the element lambda would re-scan the whole array per element
      // (O(d^2) per vector on the hot quantization path)
      embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("sc",
          greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-12)))
        .withColumn("q",
          transform(col("v"), x => floor(x * 127.0 / col("sc") + 0.5).cast("double")))
        .select(col("vec_id"), col("q"))
    }

  /** ann20: SCALAR-QUANTIZATION FIDELITY — the per-vector round-trip
    * cosine between each original vector and its int8 quantized form
    * (ann6's exact quantization — scale cancels in cosine, so no
    * dequantization step), rolled up as a fidelity histogram
    * (1e-6-wide bands — int8 on this 64-dim corpus sits above 0.9999
    * cosine, so micro-bands are what carries shape) with per-band
    * exact min/max. Completes the index-quality
    * trio (ann18 recall, ann19 PQ distortion, ann20 SQ fidelity): the
    * sign-off table for "how much does int8 cost on THIS corpus".
    * Determinism: sim is the 9-dp-rounded cosine of exact operands
    * (bit-identical both engines); the band is floor of identical
    * doubles; min/max are selections. Plan: one memoized-frame join +
    * per-row math + a low-NDV agg — scan-linear. */
  def ann20SqFidelity(s: SparkSession, dir: String): DataFrame =
    embVectors(s, dir).join(sq8(s, dir), "vec_id")
      .select(round(cosine(col("v"), col("q")), 9).as("sim"))
      .select(floor(col("sim") * 1000000).cast("long").as("band"), col("sim"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("sim")).as("min_sim"), max(col("sim")).as("max_sim"))
      .orderBy(col("band"))

  def ann6ScalarQuantTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val quant = sq8(s, dir)
    val queries = quant.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("q").as("q_q"))
    val sim = round(cosine(col("q_q"), col("q")), 9)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    quant.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann7: product-quantized ANN (PQ + ADC) — the third leg of the
    * modern embedding-store stack next to IVF (ann5) and scalar
    * quantization (ann6): 64 dims split into 8 subspaces of 8; each
    * subspace gets a 16-codeword codebook (deterministic seeds =
    * subvectors of vec_id < 16, one Lloyd step — the ann5 training
    * recipe per subspace, so the whole pipeline keeps an exact
    * oracle); a vector is stored as 8 one-byte codes (32× compression
    * with a shared 128-codeword codebook). Search is asymmetric
    * distance computation: approx dot(q, v) = Σ_m dot(q_m,
    * codeword[m, code_v[m]]) — ranked entirely from codebook lookups,
    * never touching raw vectors. The ADC is MAP-SIDE: each query's 128
    * partial dots (8 subspaces × 16 codewords) are precomputed into a
    * broadcast lookup table and each candidate row sums 8 element_at
    * lookups over its stored code array in fixed subspace order — no
    * shuffle between candidate generation and ranking, and no float
    * reassociation (bit-identical to the oracle's ORDER BY m sum). */
  /** Subspace decomposition rows (vec_id, m, s): 64 dims → 8×8,
    * session-memoized (shared by ann7 and the ann8 composition). */
  private def pqSub(s: SparkSession, dir: String): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#pqsub") {
      embVectors(s, dir)
        .select(col("vec_id"), posexplode(array((0 until 8).map(m =>
          slice(col("v"), m * 8 + 1, 8)): _*)))
        .select(col("vec_id"), col("pos").as("m"), col("col").as("s"))
    }

  private def pqL2(x: Column, c: Column): Column =
    round(dot(x, x) - lit(2.0) * dot(x, c) + dot(c, c), 9)

  /** Nearest codeword per (vector, subspace) against a broadcast
    * codebook frame (m, code, c). */
  private def pqNearest(sub: DataFrame, cands: DataFrame): DataFrame =
    sub.join(broadcast(cands), "m")
      .withColumn("d", pqL2(col("s"), col("c")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"), col("m"))
          .orderBy(col("d").asc, col("code").asc)))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("m"), col("code"))

  /** The per-subspace 16-codeword codebooks (deterministic seeds + one
    * Lloyd step), session-memoized. */
  private[graft] def pqCodebook(s: SparkSession, dir: String): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#pqcw") {
      val sub = pqSub(s, dir)
      val seeds = sub.filter(col("vec_id") < 16)
        .select(col("m"), col("vec_id").as("code"), col("s").as("c"))
      pqNearest(sub, seeds).join(sub, Seq("vec_id", "m"))
        .select(col("m"), col("code"), posexplode(col("s")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg(avg(col("col")).as("mu"))
        .groupBy(col("m"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("ps"))
        .select(col("m"), col("code"),
          transform(col("ps"), p => round(p("mu"), 9)).as("c"))
    }

  /** The stored PQ-codes table, ONE row per vector with its 8 codes as
    * an array column (the production storage layout: 8 bytes/vector) —
    * built once per corpus, queried many times. */
  private def pqCodes(s: SparkSession, dir: String): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#pqcodes") {
      pqNearest(pqSub(s, dir), pqCodebook(s, dir))
        .groupBy(col("vec_id").as("n_id"))
        .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
          p => p("code")).as("codes"))
    }

  /** ann19: PQ DISTORTION evaluation — per-subspace reconstruction
    * error of the ann7 codebook over the whole corpus, the index-
    * quality audit that pairs with ann18's recall: recall grades the
    * probe path, distortion grades the compression itself (how much
    * geometry the 8-byte codes destroy). Sign-off data an embedding
    * platform records before serving a codebook.
    *
    * Determinism: each per-row squared error is the 9-dp-rounded L2
    * ([[pqL2]], the value the code assignment already sorts by), which
    * is k/1e9 by construction — so ×1e9 and round(0) yields an exact
    * integer both engines agree on bit-for-bit. The sum is then exact
    * BIGINT arithmetic (order-free), and the mean is two fixed-order
    * IEEE divisions of exact operands. No float aggregation anywhere.
    *
    * 100 TB shape: rides the memoized pqCodes/pqCodebook frames (built
    * once, shared with ann7/ann8/ann11); the error join is code-keyed
    * against the 128-row broadcast codebook and reduces map-side to 8
    * rows — one corpus scan, no shuffle wider than the final 8-group
    * aggregate. */
  def ann19PqDistortion(s: SparkSession, dir: String): DataFrame = {
    val sub = pqSub(s, dir)
    val cb = pqCodebook(s, dir)
    val perSub = pqCodes(s, dir)
      .select(col("n_id").as("vec_id"), posexplode(col("codes")))
      .select(col("vec_id"), col("pos").as("m"), col("col").as("code"))
    perSub.join(sub, Seq("vec_id", "m"))
      .join(broadcast(cb), Seq("m", "code"))
      .withColumn("e_nano",
        round(pqL2(col("s"), col("c")) * lit(1000000000.0), 0).cast("long"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("e_nano")).as("sse_nano"))
      .select(col("m"), col("n_vectors"), col("sse_nano"),
        ((col("sse_nano").cast("double") / lit(1000000000.0)) /
          col("n_vectors")).as("mse"))
      .orderBy(col("m"))
  }

  /** Per-query ADC lookup table: 8 subspaces × 16 codewords = 128
    * partial dots dot(q_m, codeword[m, c]), flattened to one
    * 128-element array indexed by m*16+code. A query workload is tiny
    * next to the corpus (here every 50th vector; in production the
    * handful of live queries), so the whole LUT frame broadcasts. */
  private def pqQueryLut(s: SparkSession, dir: String): DataFrame = {
    val qsub = pqSub(s, dir).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("m"), col("s").as("qs"))
    qsub.join(broadcast(pqCodebook(s, dir)), "m")
      .withColumn("pd", round(dot(col("qs"), col("c")), 9))
      .groupBy(col("q_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("m"), col("code"), col("pd")))),
        p => p("pd")).as("lut"))
  }

  /** Map-side ADC ranking of (q_id, n_id, codes, lut) rows: the
    * similarity is a strict left-to-right sum over subspaces of LUT
    * lookups — element_at(lut, m*16 + codes[m] + 1) — so no shuffle
    * happens between candidate generation and the top-k window, and
    * the summation order (m ascending from 0.0) is bit-identical to
    * the former sorted-collect reassembly (and to the DuckDB oracle's
    * `list_sum(list(pd ORDER BY m))`). */
  private def pqAdcRank(cands: DataFrame, k: Int): DataFrame = {
    val sim = (0 until 8).foldLeft(lit(0.0))((acc, m) =>
      acc + element_at(col("lut"),
        lit(m * 16) + element_at(col("codes"), m + 1).cast("int") + 1))
    cands
      .withColumn("sim", round(sim, 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  def ann7PqTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    pqAdcRank(
      pqCodes(s, dir).crossJoin(broadcast(pqQueryLut(s, dir)))
        .filter(col("q_id") =!= col("n_id")), k)

  /** ann8: IVF + PQ — the COMPLETE modern ANN index, composing ann5's
    * candidate bounding with ann7's compression: the IVF probe keeps
    * per-query work at nprobe × n/k candidates, and those candidates
    * are ranked by asymmetric distance over their stored 8-byte PQ
    * codes — the index never touches a raw vector after training. At
    * 100 TB this is the only shape that holds: candidates bounded by
    * the (growing-cardinality) cell key, bytes bounded by the
    * codebook. Exact oracle by composition of the two proven
    * pipelines. */
  def ann8IvfPqTopK(s: SparkSession, dir: String, k: Int = 3,
                    nprobe: Int = 4): DataFrame = {
    val emb = embVectors(s, dir)
    val trained = ivfTrained(s, dir)
    val cands = ivfProbe(emb, trained, nprobe)
      .join(ivfAssign(emb, trained).select(col("cell"), col("vec_id").as("n_id")),
        "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
    pqAdcRank(
      cands.join(pqCodes(s, dir), "n_id")
        .join(broadcast(pqQueryLut(s, dir)), "q_id"), k)
  }

  /** ann11: two-stage retrieval — ADC shortlist, exact re-rank: the
    * production pattern that recovers accuracy PQ compression gives up.
    * Stage 1 is ann8's IVF+PQ pipeline at a wider k (shortlist=10):
    * candidates bounded by the cell key, ranked from 8-byte codes, raw
    * vectors untouched. Stage 2 joins ONLY the shortlist rows
    * (queries × 10, broadcast-sized by construction) back to their raw
    * vectors and re-ranks by exact cosine — so full-width vector reads
    * are O(queries × shortlist), never O(candidates). Oracle by
    * composition: the shared IVF+PQ CTEs at rank<=10, re-ranked in
    * SQL. */
  def ann11RerankTopK(s: SparkSession, dir: String, shortlist: Int = 10,
                      k: Int = 3): DataFrame = {
    val emb = embVectors(s, dir)
    val short = ann8IvfPqTopK(s, dir, k = shortlist)
      .select(col("q_id"), col("n_id"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    broadcast(short)
      .join(emb.select(col("vec_id").as("n_id"), col("v").as("n_v")), "n_id")
      .join(broadcast(q), "q_id")
      .withColumn("sim", round(cosine(col("q_v"), col("n_v")), 9))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann9: filtered (metadata-constrained) top-k — nearest neighbours
    * restricted to the query's own label. Filtered vector search is
    * the standard production shape (search within a tenant / language
    * / class); the filter lands *before* ranking, shrinking the
    * candidate set rather than post-filtering a top-k that may then
    * underfill. Composes with the IVF path unchanged: the predicate
    * applies to the cell-bounded candidate list (ann5/ann8), so the
    * exact-scan form gated here is the oracle twin of
    * "IVF probe ∩ metadata filter" at scale. */
  def ann9FilteredTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("q_v"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .withColumn("sim", round(cosine(col("q_v"), col("v")), 9))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ann10: range (radius) search — ALL neighbours with cosine ≥ τ,
    * not a fixed k. The other half of the vector-search API surface
    * (recall-complete retrieval for dedup/contamination sweeps, where
    * top-k silently truncates). Exact-scan baseline by contract — the
    * scale path is the banded-hyperplane candidate generation already
    * proven by dd8/ann4 (τ maps to a Hamming band width), which this
    * gate row oracle-pins the verify step of. */
  def ann10RangeSearch(s: SparkSession, dir: String,
                       tau: Double = 0.30): DataFrame = {
    val emb = embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(cosine(col("q_v"), col("v")), 9))
      .filter(col("sim") >= tau)
      .select(col("q_id"), col("vec_id").as("n_id"), col("sim"))
      .orderBy(col("q_id"), col("n_id"))
  }

  /** dd14: semantic deduplication (the SemDeDup shape, Abbas et al.
    * 2023): cluster the corpus with the ann5 IVF codebook, then drop
    * every vector that has a LOWER-id cell-mate with cosine ≥ τ.
    * This is the scale answer to "near-dup removal over embeddings":
    * the quadratic pair search is confined to cells of ~√n members
    * (total in-cell work n^1.5 instead of n², and each cell's pair
    * loop is an independent task), where dd7's exact form is n² and
    * dd8's LSH form trades recall for the bound. Output is the drop
    * LIST — one row per removed vector with its lowest-id keeper, how
    * many near-dups it had, and the strongest similarity — i.e.
    * directly subtractable from the corpus.
    *
    * Plan: the memoized cell assignment (centroid-broadcast argmin,
    * shared with ann5/ann8) feeds both arms of a cell-keyed
    * equi-self-join; the groupBy on drop_id is the only other
    * shuffle. */
  def dd14SemanticDedup(s: SparkSession, dir: String,
                        tau: Double = 0.35): DataFrame = {
    val cells = graft.spark.DfCache.memo(s, s"$dir#dd14cells") {
      ivfAssign(embVectors(s, dir), ivfTrained(s, dir))
        .select(col("vec_id"), col("v"), col("cell"))
    }
    val a = cells.select(col("cell"), col("vec_id").as("keep_id"), col("v").as("a_v"))
    val b = cells.select(col("cell"), col("vec_id").as("drop_id"), col("v").as("b_v"))
    a.join(b, "cell")
      .filter(col("keep_id") < col("drop_id"))
      .withColumn("sim", round(cosine(col("a_v"), col("b_v")), 9))
      .filter(col("sim") >= tau)
      .groupBy(col("drop_id"))
      .agg(min(col("keep_id")).as("kept_by"), count(lit(1)).as("n_near"),
        max(col("sim")).as("max_sim"))
      .orderBy(col("drop_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann14_kmeans_lloyd" -> ((s: SparkSession, dir: String) =>
      ann14KmeansLloyd(s, dir)),
    "cp8_cluster_balance" -> ((s: SparkSession, dir: String) =>
      cp8ClusterBalance(s, dir)),
    "dd14_semantic_dedup" -> ((s: SparkSession, dir: String) =>
      dd14SemanticDedup(s, dir)),
    "ann7_pq_topk" -> ((s: SparkSession, dir: String) => ann7PqTopK(s, dir)),
    "ann9_filtered_topk" -> ((s: SparkSession, dir: String) => ann9FilteredTopK(s, dir)),
    "ann10_range_search" -> ((s: SparkSession, dir: String) => ann10RangeSearch(s, dir)),
    "ann8_ivfpq_topk" -> ((s: SparkSession, dir: String) => ann8IvfPqTopK(s, dir)),
    "ann11_rerank_topk" -> ((s: SparkSession, dir: String) => ann11RerankTopK(s, dir)),
    "ann1_cosine_topk" -> (ann1CosineTopK _),
    "ann2_label_centroids" -> (ann2LabelCentroids _),
    "ann3_ivf_topk" -> (ann3IvfTopK _),
    "ann4_hyperplane_lsh" -> (ann4HyperplaneLsh _),
    "ann16_multiprobe_lsh" -> ((s: SparkSession, dir: String) =>
      ann16MultiprobeLsh(s, dir)),
    "ann5_ivf_scaled" -> ((s: SparkSession, dir: String) => ann5IvfScaled(s, dir)),
    "ann15_ivf_learned" -> ((s: SparkSession, dir: String) =>
      ann15IvfLearned(s, dir)),
    "ann17_knn_graph" -> ((s: SparkSession, dir: String) =>
      ann17KnnGraph(s, dir)),
    "ann19_pq_distortion" -> ((s: SparkSession, dir: String) =>
      ann19PqDistortion(s, dir)),
    "ann20_sq_fidelity" -> ((s: SparkSession, dir: String) =>
      ann20SqFidelity(s, dir)),
    "ann18_recall_eval" -> ((s: SparkSession, dir: String) =>
      ann18RecallEval(s, dir)),
    "ann21_beam_search" -> ((s: SparkSession, dir: String) =>
      ann21BeamRecall(s, dir)),
    "ann6_sq_topk" -> ((s: SparkSession, dir: String) => ann6ScalarQuantTopK(s, dir)),
    "dd7_embedding_dups" -> (dd7EmbeddingDups _),
    "dd8_lsh_embedding_dups" -> ((s: SparkSession, dir: String) =>
      lshCandidatePairs(s, dir)),
    "dd8_scaled_dups" -> ((s: SparkSession, dir: String) =>
      dd8ScaledDups(s, dir)),
    "ann12_filtered_ivf" -> ((s: SparkSession, dir: String) =>
      ann12FilteredIvf(s, dir)),
    "ann13_range_banded" -> ((s: SparkSession, dir: String) =>
      ann13RangeBanded(s, dir))
  )

  /** The DuckDB expression computing the packed `planes`-bit
    * hyperplane signature from the quantized vector column `q` —
    * bit-identical to [[hyperplaneBuckets]] (integer dots, shared
    * md5-derived weights; plane j's term is the same at any total
    * width, including the sign bit at j=63 which DuckDB's BIGINT
    * literal + arithmetic `>>`/`&` reproduce exactly). */
  private def sigExprSql(planes: Int): String = {
    val w = planeWeights(planes, 64)
    (0 until planes).map { j =>
      val lst = w(j).mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(q, $lst) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
  }

  // 64-plane signature + corpus-size-branched banding (the dd8WidthFor
  // twins: bits/nb CASEs mirror the Scala branch constants) — shared
  // by the dd8_scaled and ann13 oracles.
  private def scaledBandCtes: String =
    s"""emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
          FROM embeddings),
        sig AS (SELECT vec_id, v, ${sigExprSql(64)} AS sig FROM emb),
        params AS (
          SELECT CASE WHEN count(*) <= 100000 THEN 8
                      WHEN count(*) <= 400000 THEN 14 ELSE 16 END AS bits,
                 CASE WHEN count(*) <= 100000 THEN 8 ELSE 4 END AS nb
          FROM embeddings),
        bands AS (
          SELECT vec_id, b.band,
            (sig >> (b.band * bits)) & ((1::BIGINT << bits) - 1) AS bsig
          FROM sig, params, (SELECT unnest(range(0, 8)) AS band) b
          WHERE b.band < nb)"""

  // IVF+PQ pipeline CTEs (DuckDB) shared by the ann8 gate and the
  // ann11 two-stage rerank composition: IVF codebook -> probe -> PQ
  // codebooks -> stored codes -> per-query LUT partials -> ADC-ranked
  // candidates in `ranked`.
  private val ivfPqCtes: String =
    """emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS step
           FROM emb),
         seeds AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         asgn0 AS (
           SELECT e.vec_id, e.v, s.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, s.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(s.c_v, s.c_v))), 9) DESC,
               s.cell ASC) AS crk
           FROM emb e, seeds s),
         members AS (SELECT vec_id, v, cell FROM asgn0 WHERE crk = 1),
         cent AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM members)
           GROUP BY 1, 2),
         cvec AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM cent GROUP BY cell),
         asgn AS (
           SELECT e.vec_id, e.v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c),
         cells AS (SELECT vec_id, v, cell FROM asgn WHERE crk = 1),
         probe AS (
           SELECT e.vec_id AS q_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c WHERE e.vec_id % 50 = 0),
         probed AS (SELECT q_id, cell FROM probe WHERE crk <= 4),
         cands AS (
           SELECT p.q_id, m.vec_id AS n_id
           FROM probed p JOIN cells m
             ON p.cell = m.cell AND m.vec_id <> p.q_id),
         sub AS (
           SELECT vec_id, mm.m, v[mm.m*8+1 : mm.m*8+8] AS s
           FROM emb, (SELECT unnest(range(0, 8)) AS m) mm),
         pqseeds AS (SELECT m, vec_id AS code, s AS c FROM sub WHERE vec_id < 16),
         pqa0 AS (
           SELECT sub.vec_id, sub.m, pqseeds.code,
             row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
               round(list_dot_product(sub.s, sub.s)
                 - 2*list_dot_product(sub.s, pqseeds.c)
                 + list_dot_product(pqseeds.c, pqseeds.c), 9) ASC,
               pqseeds.code ASC) AS rk
           FROM sub JOIN pqseeds ON sub.m = pqseeds.m),
         pqmem AS (SELECT vec_id, m, code FROM pqa0 WHERE rk = 1),
         cw AS (
           SELECT m, code, list(round(mu, 9) ORDER BY dim) AS c FROM (
             SELECT mem.m, mem.code, d.dim, avg(s.s[d.dim + 1]) AS mu
             FROM pqmem mem
             JOIN sub s ON s.vec_id = mem.vec_id AND s.m = mem.m,
                  (SELECT unnest(range(0, 8)) AS dim) d
             GROUP BY 1, 2, 3) GROUP BY 1, 2),
         codes AS (
           SELECT vec_id, m, code FROM (
             SELECT sub.vec_id, sub.m, cw.code,
               row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
                 round(list_dot_product(sub.s, sub.s)
                   - 2*list_dot_product(sub.s, cw.c)
                   + list_dot_product(cw.c, cw.c), 9) ASC,
                 cw.code ASC) AS rk
             FROM sub JOIN cw ON sub.m = cw.m) WHERE rk = 1),
         qsub AS (SELECT vec_id AS q_id, m, s AS qs FROM sub WHERE vec_id % 50 = 0),
         partial AS (
           SELECT ca.q_id, ca.n_id, q.m,
             round(list_dot_product(q.qs, cw.c), 9) AS pd
           FROM cands ca
           JOIN qsub q ON q.q_id = ca.q_id
           JOIN codes co ON co.vec_id = ca.n_id AND co.m = q.m
           JOIN cw ON cw.m = co.m AND cw.code = co.code),
         adc AS (
           SELECT q_id, n_id, round(list_sum(list(pd ORDER BY m)), 6) AS sim
           FROM partial GROUP BY 1, 2),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM adc)"""

  /** One unrolled Lloyd iteration as a DuckDB CTE block: argmin
    * assignment against `prev`'s centroids (cosine rounded 9, cell
    * tie-break — the ivfAssign twin) then per-dim mean recompute
    * rounded 9 (the recenter twin), ending at `cv$i`. */
  private def lloydIterCtes(i: Int, prev: String): String =
    s"""asgn$i AS (
           SELECT e.vec_id, e.v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, $prev c),
         mem$i AS (SELECT vec_id, v, cell FROM asgn$i WHERE crk = 1),
         cent$i AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM mem$i)
           GROUP BY 1, 2),
         cv$i AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM cent$i GROUP BY cell)"""

  /** The full ann14 Lloyd chain as a CTE prefix: seeds → three
    * unrolled iterations → final assignment (`asgnF`, argmin at
    * crk = 1 against `cv3`). Shared by ann14 and cp8. */
  private val lloydChainCtes: String =
    s"""emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS step
           FROM emb),
         cv0 AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         ${lloydIterCtes(1, "cv0")},
         ${lloydIterCtes(2, "cv1")},
         ${lloydIterCtes(3, "cv2")},
         asgnF AS (
           SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cv3 c)"""

  // The full ann5 one-step-IVF oracle chain (seeds -> one Lloyd
  // step -> cells -> probe -> exact rerank), ending at `<p>ranked` --
  // shared by the ann5 gate, the ann18 recall evaluation, and (with a
  // name prefix, emb/params assumed present) the ann21 entry seeding,
  // so the three oracles replay ONE chain and cannot drift.
  private def ann5RankedCtesP(p: String, withBase: Boolean): String = {
    val base = if (!withBase) "" else
      """emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS step
           FROM emb),
         """
    s"""$base${p}seeds AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         ${p}asgn0 AS (
           SELECT e.vec_id, e.v, s.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, s.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(s.c_v, s.c_v))), 9) DESC,
               s.cell ASC) AS crk
           FROM emb e, ${p}seeds s),
         ${p}members AS (SELECT vec_id, v, cell FROM ${p}asgn0 WHERE crk = 1),
         ${p}cent AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM ${p}members)
           GROUP BY 1, 2),
         ${p}cvec AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM ${p}cent GROUP BY cell),
         ${p}asgn AS (
           SELECT e.vec_id, e.v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, ${p}cvec c),
         ${p}cells AS (SELECT vec_id, v, cell FROM ${p}asgn WHERE crk = 1),
         ${p}probe AS (
           SELECT e.vec_id AS q_id, e.v AS q_v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, ${p}cvec c WHERE e.vec_id % 50 = 0),
         ${p}probed AS (SELECT q_id, q_v, cell FROM ${p}probe WHERE crk <= 4),
         ${p}sims AS (
           SELECT p.q_id, m.vec_id AS n_id,
             round(list_dot_product(p.q_v, m.v) /
               (sqrt(list_dot_product(p.q_v, p.q_v)) *
                sqrt(list_dot_product(m.v, m.v))), 9) AS sim
           FROM ${p}probed p JOIN ${p}cells m
             ON p.cell = m.cell AND m.vec_id <> p.q_id),
         ${p}ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM ${p}sims)"""
  }

  private val ann5RankedCtes: String = ann5RankedCtesP("", withBase = true)

  // Brute-force top-3 ground truth over the %50 query sample, ending
  // at `brute (q_id, n_id)` — the SQL twin of bruteTopK, shared by the
  // ann18 and ann21 recall oracles.
  private val bruteTopKCtes: String =
    """bsims AS (
           SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             round(list_dot_product(q.v, e.v) /
               (sqrt(list_dot_product(q.v, q.v)) *
                sqrt(list_dot_product(e.v, e.v))), 9) AS sim
           FROM emb q, emb e
           WHERE q.vec_id % 50 = 0 AND e.vec_id <> q.vec_id),
         branked AS (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, n_id ASC) AS rank
           FROM bsims),
         brute AS (SELECT q_id, n_id FROM branked WHERE rank <= 3)"""

  /** One unrolled beam round (ann21): expand along out-edges, union
    * the previous beam, dedup, exact-rescore, keep top-8 by (sim, id)
    * — the SQL twin of the ann21BeamRecall loop body. */
  private def ann21RoundCtes(r: Int): String =
    s"""exp$r AS (
           SELECT b.q_id, e.nbr_id AS cand
           FROM beam${r - 1} b JOIN edges e ON e.src_id = b.cand),
         cands$r AS (
           SELECT DISTINCT q_id, cand FROM (
             SELECT q_id, cand FROM beam${r - 1}
             UNION ALL SELECT q_id, cand FROM exp$r)),
         scored$r AS (
           SELECT c.q_id, c.cand,
             round(list_dot_product(q.q_v, e.v) /
               (sqrt(list_dot_product(q.q_v, q.q_v)) *
                sqrt(list_dot_product(e.v, e.v))), 9) AS sim
           FROM cands$r c JOIN q ON q.q_id = c.q_id
           JOIN emb e ON e.vec_id = c.cand
           WHERE c.cand <> c.q_id),
         beam$r AS (
           SELECT q_id, cand FROM (
             SELECT q_id, cand, row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, cand ASC) AS rk
             FROM scored$r) WHERE rk <= 8)"""

  // The PQ training + encoding chain (8×16 codebooks via deterministic
  // seeds + one Lloyd step, then per-(vector, subspace) code
  // assignment) as a shared CTE prefix ending at `cw (m, code, c)` and
  // `codes (vec_id, m, code)` — the SQL twin of pqCodebook/pqCodes,
  // shared by ann7 (ADC search) and ann19 (distortion eval) so the
  // twins cannot drift.
  private val pqCodesCtes: String =
    """emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         sub AS (
           SELECT vec_id, mm.m, v[mm.m*8+1 : mm.m*8+8] AS s
           FROM emb, (SELECT unnest(range(0, 8)) AS m) mm),
         seeds AS (SELECT m, vec_id AS code, s AS c FROM sub WHERE vec_id < 16),
         a0 AS (
           SELECT sub.vec_id, sub.m, seeds.code,
             row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
               round(list_dot_product(sub.s, sub.s)
                 - 2*list_dot_product(sub.s, seeds.c)
                 + list_dot_product(seeds.c, seeds.c), 9) ASC,
               seeds.code ASC) AS rk
           FROM sub JOIN seeds ON sub.m = seeds.m),
         members AS (SELECT vec_id, m, code FROM a0 WHERE rk = 1),
         cw AS (
           SELECT m, code, list(round(mu, 9) ORDER BY dim) AS c FROM (
             SELECT mem.m, mem.code, d.dim, avg(s.s[d.dim + 1]) AS mu
             FROM members mem
             JOIN sub s ON s.vec_id = mem.vec_id AND s.m = mem.m,
                  (SELECT unnest(range(0, 8)) AS dim) d
             GROUP BY 1, 2, 3) GROUP BY 1, 2),
         codes AS (
           SELECT vec_id, m, code FROM (
             SELECT sub.vec_id, sub.m, cw.code,
               row_number() OVER (PARTITION BY sub.vec_id, sub.m ORDER BY
                 round(list_dot_product(sub.s, sub.s)
                   - 2*list_dot_product(sub.s, cw.c)
                   + list_dot_product(cw.c, cw.c), 9) ASC,
                 cw.code ASC) AS rk
             FROM sub JOIN cw ON sub.m = cw.m) WHERE rk = 1)"""

  val oracles: Map[String, String] = Map(
    // ann19: the same training/encoding chain as ann7, read as a
    // QUALITY metric — per-subspace reconstruction error. Each
    // per-row error is integer-ized at nano precision (the 9-dp
    // rounded L2 is k/1e9 by construction, so ×1e9 + round(0) is an
    // exact integer both engines agree on) and the sum/mean come out
    // of exact BIGINT arithmetic + two fixed-order IEEE divisions.
    "ann19_pq_distortion" ->
      s"""WITH $pqCodesCtes,
         err AS (
           SELECT codes.m,
             CAST(round(round(list_dot_product(sub.s, sub.s)
                 - 2*list_dot_product(sub.s, cw.c)
                 + list_dot_product(cw.c, cw.c), 9) * 1000000000.0, 0)
               AS BIGINT) AS e_nano
           FROM codes
           JOIN sub ON sub.vec_id = codes.vec_id AND sub.m = codes.m
           JOIN cw ON cw.m = codes.m AND cw.code = codes.code)
         SELECT m, count(*) AS n_vectors,
           CAST(sum(e_nano) AS BIGINT) AS sse_nano,
           (CAST(sum(e_nano) AS BIGINT) / 1000000000.0) / count(*) AS mse
         FROM err GROUP BY m ORDER BY m""",
    // kNN-graph: per-corpus-vector top-k within its OWN final Lloyd
    // cell — the lloydChain's asgnF reused, vectors re-joined from emb
    "ann17_knn_graph" ->
      s"""WITH $lloydChainCtes,
         cells AS (
           SELECT a.vec_id, e.v, a.cell
           FROM asgnF a JOIN emb e USING (vec_id) WHERE a.crk = 1),
         sims AS (
           SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 9) AS sim
           FROM cells a JOIN cells b
             ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         ranked AS (
           SELECT src_id, nbr_id, sim,
             row_number() OVER (PARTITION BY src_id
               ORDER BY sim DESC, nbr_id ASC) AS rank
           FROM sims)
         SELECT src_id, nbr_id, sim, rank
         FROM ranked WHERE rank <= 3 ORDER BY src_id, rank""",
    "ann14_kmeans_lloyd" ->
      s"""WITH $lloydChainCtes,
         sizes AS (
           SELECT cell, count(*) AS n_members FROM asgnF
           WHERE crk = 1 GROUP BY cell),
         outp AS (
           SELECT c.cell, s.n_members,
             generate_subscripts(c.c_v, 1) - 1 AS dim,
             unnest(c.c_v) + 0.0 AS c_m
           FROM cv3 c JOIN sizes s USING (cell))
         SELECT cell, n_members, dim, c_m FROM outp
         ORDER BY cell, dim""",
    "cp8_cluster_balance" ->
      s"""WITH $lloydChainCtes,
         cells AS (SELECT vec_id, cell FROM asgnF WHERE crk = 1),
         sel AS (
           SELECT vec_id, cell,
             row_number() OVER (PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
           FROM cells)
         SELECT vec_id, cell, rk FROM sel WHERE rk <= 20
         ORDER BY cell, rk""",
    // dd14 reuses ann5's deterministic codebook CTE chain (seeds →
    // one Lloyd step → argmin cells), then self-joins within cells.
    "dd14_semantic_dedup" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS step
           FROM emb),
         seeds AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         asgn0 AS (
           SELECT e.vec_id, e.v, s.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, s.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(s.c_v, s.c_v))), 9) DESC,
               s.cell ASC) AS crk
           FROM emb e, seeds s),
         members AS (SELECT vec_id, v, cell FROM asgn0 WHERE crk = 1),
         cent AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM members)
           GROUP BY 1, 2),
         cvec AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM cent GROUP BY cell),
         asgn AS (
           SELECT e.vec_id, e.v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c),
         cells AS (SELECT vec_id, v, cell FROM asgn WHERE crk = 1),
         pairs AS (
           SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 9) AS sim
           FROM cells a JOIN cells b
             ON a.cell = b.cell AND a.vec_id < b.vec_id)
         SELECT drop_id, min(keep_id) AS kept_by, count(*) AS n_near,
           max(sim) AS max_sim
         FROM pairs WHERE sim >= 0.35
         GROUP BY drop_id ORDER BY drop_id""",
    "ann9_filtered_topk" ->
      """WITH emb AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_v
               FROM emb WHERE vec_id % 50 = 0),
         sims AS (
           SELECT q.q_id, e.vec_id AS n_id,
             round(list_dot_product(q.q_v, e.v) /
               (sqrt(list_dot_product(q.q_v, q.q_v)) *
                sqrt(list_dot_product(e.v, e.v))), 9) AS sim
           FROM q, emb e
           WHERE e.vec_id <> q.q_id AND e.label = q.q_label),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 5
         ORDER BY q_id, rank""",
    "ann10_range_search" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id % 50 = 0),
         sims AS (
           SELECT q.q_id, e.vec_id AS n_id,
             round(list_dot_product(q.q_v, e.v) /
               (sqrt(list_dot_product(q.q_v, q.q_v)) *
                sqrt(list_dot_product(e.v, e.v))), 9) AS sim
           FROM q, emb e WHERE e.vec_id <> q.q_id)
         SELECT q_id, n_id, sim FROM sims WHERE sim >= 0.30
         ORDER BY q_id, n_id""",
    "ann1_cosine_topk" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id % 50 = 0),
         sims AS (
           SELECT q.q_id, e.vec_id AS n_id,
             round(list_dot_product(q.q_v, e.v) /
               (sqrt(list_dot_product(q.q_v, q.q_v)) *
                sqrt(list_dot_product(e.v, e.v))), 9) AS sim
           FROM q, emb e WHERE e.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 5
         ORDER BY q_id, rank""",
    "ann2_label_centroids" ->
      """WITH e AS (
           SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS val,
                  generate_subscripts(embedding, 1) - 1 AS dim
           FROM embeddings)
         SELECT label, dim, round(avg(val), 9) AS centroid
         FROM e GROUP BY 1, 2 ORDER BY 1, 2""",
    "ann3_ivf_topk" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) //
                   CAST(2 AS BIGINT))) AS step
           FROM emb),
         seeds AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         asgn0 AS (
           SELECT e.vec_id, e.v, s.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, s.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(s.c_v, s.c_v))), 9) DESC,
               s.cell ASC) AS crk
           FROM emb e, seeds s),
         members AS (SELECT vec_id, v, cell FROM asgn0 WHERE crk = 1),
         cent AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM members)
           GROUP BY 1, 2),
         cvec AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM cent GROUP BY cell),
         asgn AS (
           SELECT e.vec_id, e.v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c),
         cells AS (SELECT vec_id, v, cell FROM asgn WHERE crk = 1),
         sims AS (
           SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 9) AS sim
           FROM cells a JOIN cells b
             ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    "dd8_scaled_dups" ->
      s"""WITH $scaledBandCtes,
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT c.id_a, c.id_b,
              round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 6) AS sim
            FROM cand c
            JOIN sig a ON a.vec_id = c.id_a
            JOIN sig b ON b.vec_id = c.id_b)
          SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.45
          ORDER BY 1, 2""",
    "ann13_range_banded" ->
      s"""WITH $scaledBandCtes,
          cand AS (
            SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig
              AND a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id),
          pairs AS (
            SELECT c.q_id, c.n_id,
              round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 9) AS sim
            FROM cand c
            JOIN sig a ON a.vec_id = c.q_id
            JOIN sig b ON b.vec_id = c.n_id)
          SELECT q_id, n_id, sim FROM pairs WHERE sim >= 0.30
          ORDER BY 1, 2""",
    // ann12: the proven ann5 CTE chain with labels carried into the
    // probe ∩ filter candidate list.
    "ann12_filtered_ivf" ->
      """WITH emb AS (
           SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         params AS (
           SELECT greatest(CAST(1 AS BIGINT),
             CAST(count(*) AS BIGINT) //
               greatest(CAST(2 AS BIGINT),
                 CAST(ceil(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))) AS step
           FROM emb),
         seeds AS (
           SELECT vec_id AS cell, v AS c_v FROM emb, params
           WHERE vec_id % step = 0),
         asgn0 AS (
           SELECT e.vec_id, e.v, s.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, s.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(s.c_v, s.c_v))), 9) DESC,
               s.cell ASC) AS crk
           FROM emb e, seeds s),
         members AS (SELECT vec_id, v, cell FROM asgn0 WHERE crk = 1),
         cent AS (
           SELECT cell, dim, avg(val) AS m
           FROM (SELECT cell, unnest(v) AS val,
                   generate_subscripts(v, 1) - 1 AS dim FROM members)
           GROUP BY 1, 2),
         cvec AS (
           SELECT cell, list(round(m, 9) ORDER BY dim) AS c_v
           FROM cent GROUP BY cell),
         asgn AS (
           SELECT e.vec_id, e.v, e.label, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c),
         cells AS (SELECT vec_id, v, label, cell FROM asgn WHERE crk = 1),
         probe AS (
           SELECT e.vec_id AS q_id, e.v AS q_v, e.label AS q_label, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cvec c WHERE e.vec_id % 50 = 0),
         probed AS (SELECT q_id, q_v, q_label, cell FROM probe WHERE crk <= 4),
         sims AS (
           SELECT p.q_id, m.vec_id AS n_id,
             round(list_dot_product(p.q_v, m.v) /
               (sqrt(list_dot_product(p.q_v, p.q_v)) *
                sqrt(list_dot_product(m.v, m.v))), 9) AS sim
           FROM probed p JOIN cells m
             ON p.cell = m.cell AND m.vec_id <> p.q_id
               AND m.label = p.q_label),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    // ann16 twin: same signature CTE; probe list = own bucket + the 8
    // single-bit flips, xor() on the BIGINT signature
    "ann16_multiprobe_lsh" -> {
      val sigExpr = sigExprSql(8)
      val flips = (0 until 8).map(j => s"xor(sig, ${1L << j})")
        .mkString(", ")
      s"""WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000) AS BIGINT)) AS q
            FROM embeddings),
          sig AS (SELECT vec_id, v, $sigExpr AS sig FROM emb),
          qs AS (
            SELECT vec_id AS q_id, v AS q_v,
              unnest([sig, $flips]) AS probe
            FROM sig WHERE vec_id % 50 = 0),
          sims AS (
            SELECT p.q_id, m.vec_id AS n_id,
              round(list_dot_product(p.q_v, m.v) /
                (sqrt(list_dot_product(p.q_v, p.q_v)) *
                 sqrt(list_dot_product(m.v, m.v))), 9) AS sim
            FROM qs p JOIN sig m
              ON m.sig = p.probe AND m.vec_id <> p.q_id),
          ranked AS (
            SELECT q_id, n_id, sim, row_number() OVER (
              PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
            FROM sims)
          SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
          ORDER BY q_id, rank"""
    },
    "ann4_hyperplane_lsh" -> {
      val sigExpr = sigExprSql(8)
      s"""WITH emb AS (
            SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000) AS BIGINT)) AS q
            FROM embeddings),
          sig AS (SELECT vec_id, $sigExpr AS sig FROM emb)
          SELECT sig, count(*) AS n_vectors FROM sig
          GROUP BY sig ORDER BY sig"""
    },
    "dd8_lsh_embedding_dups" -> {
      val sigExpr = sigExprSql(8)
      s"""WITH emb AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000) AS BIGINT)) AS q
            FROM embeddings),
          sig AS (SELECT vec_id, v, $sigExpr AS sig FROM emb),
          bands AS (
            SELECT vec_id, bd.band, (sig >> (bd.band * 2)) & 3 AS bsig
            FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) bd),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT c.id_a, c.id_b,
              round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) *
                 sqrt(list_dot_product(b.v, b.v))), 6) AS sim
            FROM cand c
            JOIN sig a ON a.vec_id = c.id_a
            JOIN sig b ON b.vec_id = c.id_b)
          SELECT id_a, id_b, sim FROM pairs WHERE sim >= 0.45
          ORDER BY 1, 2"""
    },
    "ann8_ivfpq_topk" ->
      s"""WITH $ivfPqCtes
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    "ann11_rerank_topk" ->
      s"""WITH $ivfPqCtes,
         short AS (SELECT q_id, n_id FROM ranked WHERE rank <= 10),
         ex AS (
           SELECT sh.q_id, sh.n_id,
             round(list_dot_product(q.v, n.v) /
               (sqrt(list_dot_product(q.v, q.v)) *
                sqrt(list_dot_product(n.v, n.v))), 9) AS sim
           FROM short sh
           JOIN emb q ON q.vec_id = sh.q_id
           JOIN emb n ON n.vec_id = sh.n_id),
         rr AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM ex)
         SELECT q_id, n_id, sim, rank FROM rr WHERE rank <= 3
         ORDER BY q_id, rank""",
    "ann7_pq_topk" ->
      s"""WITH $pqCodesCtes,
         qsub AS (SELECT vec_id AS q_id, m, s AS qs FROM sub WHERE vec_id % 50 = 0),
         partial AS (
           SELECT q.q_id, c.vec_id AS n_id, q.m,
             round(list_dot_product(q.qs, cw.c), 9) AS pd
           FROM qsub q
           JOIN codes c ON q.m = c.m
           JOIN cw ON cw.m = c.m AND cw.code = c.code),
         adc AS (
           SELECT q_id, n_id, round(list_sum(list(pd ORDER BY m)), 6) AS sim
           FROM partial WHERE q_id <> n_id GROUP BY 1, 2),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM adc)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    // ann20: ann6's quantization expression verbatim; sim is the
    // 9-dp cosine of exact operands, band = floor of identical
    // doubles, min/max selections — hash-exact with no aggregation
    // of floats anywhere
    "ann20_sq_fidelity" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q8 AS (
           SELECT vec_id, v,
             list_transform(v, x -> floor(x * 127.0 /
               greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) + 0.5)) AS q
           FROM emb),
         sims AS (
           SELECT vec_id,
             round(list_dot_product(v, q) /
               (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q))), 9) AS sim
           FROM q8)
         SELECT CAST(floor(sim * 1000000) AS BIGINT) AS band,
           count(*) AS n_vectors, min(sim) AS min_sim, max(sim) AS max_sim
         FROM sims GROUP BY 1 ORDER BY 1""",
    "ann6_sq_topk" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q8 AS (
           SELECT vec_id,
             list_transform(v, x -> floor(x * 127.0 /
               greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) + 0.5)) AS q
           FROM emb),
         qs AS (SELECT vec_id AS q_id, q AS q_q FROM q8 WHERE vec_id % 50 = 0),
         sims AS (
           SELECT qs.q_id, e.vec_id AS n_id,
             round(list_dot_product(qs.q_q, e.q) /
               (sqrt(list_dot_product(qs.q_q, qs.q_q)) *
                sqrt(list_dot_product(e.q, e.q))), 9) AS sim
           FROM qs, q8 e WHERE e.vec_id <> qs.q_id),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    "ann5_ivf_scaled" ->
      s"""WITH $ann5RankedCtes
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    // ann18: recall@k of the ann5 probe path against the exact
    // brute-force top-k -- same chain, plus a brute arm and an
    // intersection count; recall is one IEEE division of exact ints
    "ann18_recall_eval" ->
      s"""WITH $ann5RankedCtes,
         ivf AS (SELECT q_id, n_id FROM ranked WHERE rank <= 3),
         $bruteTopKCtes,
         hits AS (
           SELECT b.q_id, count(ivf.n_id) AS n_hits
           FROM brute b LEFT JOIN ivf
             ON ivf.q_id = b.q_id AND ivf.n_id = b.n_id
           GROUP BY 1)
         SELECT q_id, 3 AS k, n_hits, n_hits / 3 AS recall
         FROM hits ORDER BY q_id""",
    // ann21: the ann17 graph CTE + unrolled beam rounds + the shared
    // brute ground-truth CTE — construction and serving on one chain
    "ann21_beam_search" ->
      s"""WITH $lloydChainCtes,
         cells AS (
           SELECT a.vec_id, e.v, a.cell
           FROM asgnF a JOIN emb e USING (vec_id) WHERE a.crk = 1),
         gsims AS (
           SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 9) AS sim
           FROM cells a JOIN cells b
             ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         edges AS (
           SELECT src_id, nbr_id FROM (
             SELECT src_id, nbr_id, row_number() OVER (PARTITION BY src_id
               ORDER BY sim DESC, nbr_id ASC) AS rank
             FROM gsims) WHERE rank <= 8),
         q AS (SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id % 50 = 0),
         ${ann5RankedCtesP("e_", withBase = false)},
         beam0 AS (
           SELECT q_id, n_id AS cand FROM e_ranked WHERE rank <= 3),
         ${ann21RoundCtes(1)},
         ${ann21RoundCtes(2)},
         ${ann21RoundCtes(3)},
         btopk AS (
           SELECT q_id, cand AS n_id FROM (
             SELECT q_id, cand, row_number() OVER (PARTITION BY q_id
               ORDER BY sim DESC, cand ASC) AS rk
             FROM scored3) WHERE rk <= 3),
         $bruteTopKCtes,
         hits AS (
           SELECT b.q_id, count(t.n_id) AS n_hits
           FROM brute b LEFT JOIN btopk t
             ON t.q_id = b.q_id AND t.n_id = b.n_id
           GROUP BY 1)
         SELECT q_id, 3 AS k, n_hits, n_hits / 3 AS recall
         FROM hits ORDER BY q_id""",
    // ann5's probe/rank tail served from ann14's trained codebook —
    // the two proven CTE chains composed verbatim.
    "ann15_ivf_learned" ->
      s"""WITH $lloydChainCtes,
         cells AS (
           SELECT a.vec_id, e.v, a.cell
           FROM asgnF a JOIN emb e USING (vec_id) WHERE a.crk = 1),
         probe AS (
           SELECT e.vec_id AS q_id, e.v AS q_v, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round(list_dot_product(e.v, c.c_v) /
                 (sqrt(list_dot_product(e.v, e.v)) *
                  sqrt(list_dot_product(c.c_v, c.c_v))), 9) DESC,
               c.cell ASC) AS crk
           FROM emb e, cv3 c WHERE e.vec_id % 50 = 0),
         probed AS (SELECT q_id, q_v, cell FROM probe WHERE crk <= 4),
         sims AS (
           SELECT p.q_id, m.vec_id AS n_id,
             round(list_dot_product(p.q_v, m.v) /
               (sqrt(list_dot_product(p.q_v, p.q_v)) *
                sqrt(list_dot_product(m.v, m.v))), 9) AS sim
           FROM probed p JOIN cells m
             ON p.cell = m.cell AND m.vec_id <> p.q_id),
         ranked AS (
           SELECT q_id, n_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
           FROM sims)
         SELECT q_id, n_id, sim, rank FROM ranked WHERE rank <= 3
         ORDER BY q_id, rank""",
    "dd7_embedding_dups" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) *
              sqrt(list_dot_product(b.v, b.v))), 6) AS sim
         FROM emb a, emb b
         WHERE a.vec_id < b.vec_id
           AND round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) *
              sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
         ORDER BY 1, 2"""
  )
}

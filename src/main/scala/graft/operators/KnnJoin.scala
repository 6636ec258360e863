package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed k-nearest-neighbor join — the spatial retrieval
  * operator the reference family lacks (DS-JedAI is relation-predicate
  * interlinking only; kNN joins are the other classic distributed
  * spatial workload, cf. the published Sedona/Simba operator sets).
  *
  * Algorithm (expanding-ring grid probes, exact by certificate):
  *
  * 1. **Grid candidates** — targets hash into √-sized grid cells
  *    (cells per axis ≈ √(n/4k), so a 3×3 neighborhood holds ~36k
  *    expected candidates); each source equi-joins its (2r+1)×(2r+1)
  *    block (r = 1 first) and ranks candidates by (distance², id). A
  *    source's round-r result is CERTIFIED exact when it saw ≥ k
  *    candidates AND its kth distance is < r·min(gx, gy): every
  *    non-candidate lies outside the block, hence at distance ≥ r cell
  *    widths — so no true neighbor was missed.
  * 2. **Escalation** — uncertified sources re-probe with the ring
  *    radius DOUBLED (3×3 → 5×5 → 9×9 → …) until certified or the
  *    block covers the whole grid (where every target is a candidate
  *    and the result is exact unconditionally). Because the
  *    certificate radius grows with r, a source certifies once
  *    r·min(gx,gy) exceeds its kth-neighbor distance — so the work per
  *    source is O(targets within ~2·d_k), the output-sensitive bound,
  *    NEVER the |uncertified| × |targets| product the previous
  *    single-shot residual paid. On a heavily clustered corpus (95 %
  *    of targets in 1 % of cells) the old residual made the
  *    uncertified×all pass the dominant cost; the ring path keeps each
  *    source local to its own density (KnnJoinSpec clustered cases,
  *    Scale `sp15_knn_clustered`).
  *
  * The grid DOMAIN is derived from the target bounds in the SAME
  * single stats job that sizes the grid — never assumed. (The first
  * cut took a static extent parameter; a corpus whose coordinates
  * exceeded it clamped most targets into the edge cells, failed every
  * certificate, and pushed the full source set through the residual —
  * a ~2 B-row window at 10× in the Scale harness. Correct, but the
  * worst case. Grid geometry must follow the data.)
  *
  * The union over rounds is EXACTLY the brute-force kNN — gated
  * against a DuckDB cross-join oracle (sp15) — while the plan never
  * materializes the source × target product: each round is one narrow
  * equi-join on cell keys plus a per-source window, both
  * shuffle-on-key. At 100 TB the grid is the only shape that works;
  * the certificate turns its usual "approximate at the margins" caveat
  * into an exact result.
  *
  * EAGER, not a lazy plan builder: the stats job runs at call time,
  * and each round `localCheckpoint`s its narrow top-k frame (≈ k rows
  * per source) — certified and remaining both branch from it, and
  * without the checkpoint each branch would recompute the
  * double-window candidate scan (measured 3× the whole-operator cost
  * at the 100× Scale corpus), while an unbroken lineage across rounds
  * would grow the plan geometrically. `localCheckpoint` pins those
  * frames to executor-local storage, which Spark documents as
  * unreliable under executor loss/decommission — acceptable for this
  * repo's gate/bench/scale harnesses (single JVM). For fault-tolerant
  * cluster deployments pass `checkpointDir = Some(dfsPath)`: every
  * per-round cut then goes through reliable DFS-backed `checkpoint`
  * (same semantics, survives executor loss) via
  * [[graft.spark.Checkpoints]].
  *
  * Inputs carry integer-derived coordinates in this repo's gates, so
  * distance² arithmetic is exact in doubles and the oracle hashes
  * bit-identically.
  *
  * @param src (src_id: long, x: double, y: double)
  * @param tgt (tgt_id: long, x: double, y: double)
  */
object KnnJoin {

  def knnJoin(src: DataFrame, tgt: DataFrame, k: Int,
              checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be positive")
    def cut(df: DataFrame): DataFrame =
      graft.spark.Checkpoints.cut(df, checkpointDir)
    // One dim-side stats job sizes the grid AND derives its domain
    // (same one-job contract as θ's stats collect). Cells/axis ~
    // sqrt(n/4k) keeps E[3x3 candidates] ≈ 36k regardless of n.
    val b = tgt.agg(count(lit(1)), min(col("x")), max(col("x")),
      min(col("y")), max(col("y"))).head
    val n = b.getLong(0)
    val (x0, x1, y0, y1) =
      if (n == 0) (0.0, 1.0, 0.0, 1.0)
      else (b.getDouble(1), b.getDouble(2), b.getDouble(3), b.getDouble(4))
    val ncells = math.max(1L, math.sqrt(n.toDouble / (4.0 * k)).toLong)
    val gx = math.max((x1 - x0) / ncells, 1e-9)
    val gy = math.max((y1 - y0) / ncells, 1e-9)
    val gMin = math.min(gx, gy)

    def cell(c: Column, origin: Double, g: Double): Column =
      least(greatest(floor((c - origin) / g), lit(0)), lit(ncells - 1))
        .cast("long")

    val t = tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty"),
      cell(col("x"), x0, gx).as("tcx"), cell(col("y"), y0, gy).as("tcy"))

    val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
      (col("sy") - col("ty")) * (col("sy") - col("ty"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("d2"), col("tgt_id"))

    var remaining = src
      .select(col("src_id"), col("x").as("sx"), col("y").as("sy"),
        cell(col("x"), x0, gx).as("scx"), cell(col("y"), y0, gy).as("scy"))
    var pieces = List.empty[DataFrame]
    var r = 1L
    var done = false
    while (!done) {
      // once the block covers every cell, all targets are candidates
      // and the round is exact with no distance condition
      val covers = r >= ncells
      val ranked = remaining
        .withColumn("ncx", explode(sequence(
          greatest(col("scx") - r, lit(0L)),
          least(col("scx") + r, lit(ncells - 1)))))
        .withColumn("ncy", explode(sequence(
          greatest(col("scy") - r, lit(0L)),
          least(col("scy") + r, lit(ncells - 1)))))
        .join(t, col("ncx") === col("tcx") && col("ncy") === col("tcy"))
        .select(col("src_id"), col("tgt_id"), d2.as("d2"))
        .withColumn("rank", row_number().over(w))
        .withColumn("n_cand",
          count(lit(1)).over(Window.partitionBy(col("src_id"))))
      // narrow top-k frame materialized ONCE per round (see scaladoc)
      val topk = cut(ranked.filter(col("rank") <= k))
      // certificate: saw >= k candidates AND the kth distance fits
      // inside r cell widths (strict) — then nothing outside the
      // (2r+1)x(2r+1) block can be closer than the kth candidate
      val rad = r * gMin
      val certified = topk.groupBy(col("src_id"))
        .agg(max(col("n_cand")).as("nc"), max(col("d2")).as("dk2"))
        .filter(lit(covers) || (col("nc") >= k && col("dk2") < lit(rad * rad)))
        .select(col("src_id"))
      pieces ::= topk.join(certified, "src_id")
        .select(col("src_id"), col("tgt_id"), col("rank"), col("d2"))
      done = covers
      if (!done) {
        remaining = cut(
          remaining.join(certified, Seq("src_id"), "left_anti"))
        if (remaining.isEmpty) done = true else r *= 2
      }
    }
    pieces.reduce(_ unionByName _)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed k-nearest-neighbor join — the spatial retrieval
  * operator the reference family lacks (DS-JedAI is relation-predicate
  * interlinking only; kNN joins are the other classic distributed
  * spatial workload, cf. the published Sedona/Simba operator sets).
  *
  * Algorithm (two bounded phases, exact by certificate):
  *
  * 1. **Grid candidates** — targets hash into √-sized grid cells
  *    (cells per axis ≈ √(n/4k), so a 3×3 neighborhood holds ~36k
  *    expected candidates); each source equi-joins its 3×3 block and
  *    ranks candidates by (distance², id). A source's result is
  *    CERTIFIED exact when it saw ≥ k candidates AND its kth distance
  *    is < one cell width min(gx, gy): every non-candidate lies outside
  *    the 3×3 block, hence at distance ≥ that width — so no true
  *    neighbor was missed.
  * 2. **Residual** — the (empirically few) uncertified sources rerun
  *    against ALL targets via a broadcast of just those sources. Exact
  *    by construction, cost bounded by |uncertified| × n, and the pass
  *    vanishes as density grows.
  *
  * The grid DOMAIN is derived from the target bounds in the SAME
  * single stats job that sizes the grid — never assumed. (The first
  * cut took a static extent parameter; a corpus whose coordinates
  * exceeded it clamped most targets into the edge cells, failed every
  * certificate, and pushed the full source set through the residual —
  * a ~2 B-row window at 10× in the Scale harness. Correct, but the
  * worst case. Grid geometry must follow the data.)
  *
  * The union is EXACTLY the brute-force kNN — gated against a DuckDB
  * cross-join oracle (sp15) — while the plan never materializes the
  * source × target product: one narrow equi-join on cell keys plus a
  * per-source window, both shuffle-on-key. At 100 TB the grid is the
  * only shape that works; the certificate turns its usual
  * "approximate at the margins" caveat into an exact result.
  *
  * Inputs carry integer-derived coordinates in this repo's gates, so
  * distance² arithmetic is exact in doubles and the oracle hashes
  * bit-identically.
  *
  * @param src (src_id: long, x: double, y: double)
  * @param tgt (tgt_id: long, x: double, y: double)
  */
object KnnJoin {

  def knnJoin(src: DataFrame, tgt: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
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
    val sCells = src
      .select(col("src_id"), col("x").as("sx"), col("y").as("sy"),
        cell(col("x"), x0, gx).as("scx"), cell(col("y"), y0, gy).as("scy"))
      .withColumn("ncx", explode(array(col("scx") - 1, col("scx"), col("scx") + 1)))
      .withColumn("ncy", explode(array(col("scy") - 1, col("scy"), col("scy") + 1)))

    val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
      (col("sy") - col("ty")) * (col("sy") - col("ty"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("d2"), col("tgt_id"))
    val ranked = sCells
      .join(t, col("ncx") === col("tcx") && col("ncy") === col("tcy"))
      .select(col("src_id"), col("tgt_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .withColumn("n_cand", count(lit(1)).over(Window.partitionBy(col("src_id"))))

    // Materialize the narrow top-k frame (≈ k rows per source) ONCE:
    // certified, good AND bad all branch from it, and without the
    // checkpoint each branch recomputes the double-window `ranked`
    // scan — measured 3× the whole-operator cost at the 100× scale
    // corpus. The checkpointed frame is k·|src| short rows.
    val topk = ranked.filter(col("rank") <= k).localCheckpoint()
    // certificate: saw >= k candidates AND the kth distance fits inside
    // one cell width (strict) — then nothing outside the 3x3 block can
    // be closer than the kth candidate
    val certified = topk.groupBy(col("src_id"))
      .agg(max(col("n_cand")).as("nc"), max(col("d2")).as("dk2"))
      .filter(col("nc") >= k && col("dk2") < gMin * gMin)
      .select(col("src_id"))

    val good = topk.join(certified, "src_id")
      .select(col("src_id"), col("tgt_id"), col("rank"), col("d2"))

    // residual: uncertified sources x ALL targets, sources broadcast
    // (bounded by the certificate failure count, not the corpus)
    val bad = src.join(certified, Seq("src_id"), "left_anti")
      .select(col("src_id"), col("x").as("sx"), col("y").as("sy"))
    val residual = broadcast(bad)
      .crossJoin(tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty")))
      .select(col("src_id"), col("tgt_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src_id"), col("tgt_id"), col("rank"), col("d2"))

    good.unionByName(residual)
  }
}

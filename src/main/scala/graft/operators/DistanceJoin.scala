package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed ε-distance join — all (source, target) pairs
  * within euclidean distance `radius`. Together with the relation
  * predicates (sp1-sp13) and the kNN join (sp15) this completes the
  * classic distributed-spatial-join triad (cf. the published
  * Sedona/Simba operator sets; the DS-JedAI reference family is
  * relation-predicate interlinking only).
  *
  * Algorithm: targets hash once into a uniform grid whose per-axis
  * cell width is forced ≥ radius; each source probes its 3×3 cell
  * block. Any pair within radius differs by < one cell per axis, so it
  * lands inside the block — coverage is exact BY CONSTRUCTION (no
  * residual pass needed, unlike kNN where the certificate radius is
  * data-dependent). Each target owns exactly one cell, so no pair is
  * emitted twice and no dedup shuffle exists. The plan is one narrow
  * equi-join on cell keys (shuffle-on-key both sides,
  * AQE-skew-splittable) plus a codegen'd distance filter; the
  * source×target product is never materialized. Cells/axis also caps
  * at ~√(n/2) so sparse corpora don't degenerate into per-point cells.
  *
  * The grid DOMAIN is derived from the target bounds in the same
  * single stats job that sizes the grid — never assumed (see
  * [[KnnJoin]] for the measured cost of a static-extent grid whose
  * data outgrew it). Out-of-domain sources clamp monotonically, which
  * can only shrink cell-index distances, so coverage is preserved.
  *
  * Gate coordinates are half-integer, so distance² is exact double
  * arithmetic and `d2 <= radius²` is a bit-deterministic predicate in
  * both engines (sp16 hash-gates against the DuckDB cross-join form).
  *
  * @param src (src_id: long, x: double, y: double)
  * @param tgt (tgt_id: long, x: double, y: double)
  * @param radius inclusive euclidean match distance
  */
object DistanceJoin {

  def distanceJoin(src: DataFrame, tgt: DataFrame, radius: Double): DataFrame = {
    require(radius > 0, "radius must be positive")
    // One dim-side stats job sizes the grid and derives its domain
    // (same one-job contract as θ's stats collect and the kNN grid).
    val b = tgt.agg(count(lit(1)), min(col("x")), max(col("x")),
      min(col("y")), max(col("y"))).head
    val n = b.getLong(0)
    val (x0, x1, y0, y1) =
      if (n == 0) (0.0, 1.0, 0.0, 1.0)
      else (b.getDouble(1), b.getDouble(2), b.getDouble(3), b.getDouble(4))
    val cap = math.max(1L, math.ceil(math.sqrt(n / 2.0)).toLong)
    def axisCells(span: Double): Long =
      math.min(math.max(1L, math.floor(span / radius).toLong), cap) // g >= radius
    val (ncx, ncy) = (axisCells(x1 - x0), axisCells(y1 - y0))
    val gx = math.max((x1 - x0) / ncx, radius)
    val gy = math.max((y1 - y0) / ncy, radius)

    def cell(c: Column, origin: Double, g: Double, nc: Long): Column =
      least(greatest(floor((c - origin) / g), lit(0)), lit(nc - 1)).cast("long")

    val t = tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty"),
      cell(col("x"), x0, gx, ncx).as("tcx"), cell(col("y"), y0, gy, ncy).as("tcy"))
    val sCells = src
      .select(col("src_id"), col("x").as("sx"), col("y").as("sy"),
        cell(col("x"), x0, gx, ncx).as("scx"), cell(col("y"), y0, gy, ncy).as("scy"))
      .withColumn("ncx", explode(array(col("scx") - 1, col("scx"), col("scx") + 1)))
      .withColumn("ncy", explode(array(col("scy") - 1, col("scy"), col("scy") + 1)))

    val d2 = (col("sx") - col("tx")) * (col("sx") - col("tx")) +
      (col("sy") - col("ty")) * (col("sy") - col("ty"))
    sCells
      .join(t, col("ncx") === col("tcx") && col("ncy") === col("tcy"))
      .select(col("src_id"), col("tgt_id"), d2.as("d2"))
      .filter(col("d2") <= lit(radius * radius))
  }
}

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
  * Algorithm: targets hash once into a uniform grid whose cell width g
  * is forced ≥ radius; each source probes its 3×3 cell block. Any pair
  * within radius differs by < g per axis, so it lands inside the block
  * — coverage is exact BY CONSTRUCTION (no residual pass needed,
  * unlike kNN where the certificate radius is data-dependent). Each
  * target owns exactly one cell, so no pair is emitted twice and no
  * dedup shuffle exists. The plan is one narrow equi-join on cell keys
  * (shuffle-on-key both sides, AQE-skew-splittable) plus a codegen'd
  * distance filter; the source×target product is never materialized.
  * Cells/axis also caps at ~√(n/2) so sparse corpora don't degenerate
  * into per-point cells with empty neighborhoods dominating task count.
  *
  * Gate coordinates are half-integer, so distance² is exact double
  * arithmetic and `d2 <= radius²` is a bit-deterministic predicate in
  * both engines (sp16 hash-gates against the DuckDB cross-join form).
  *
  * @param src (src_id: long, x: double, y: double)
  * @param tgt (tgt_id: long, x: double, y: double)
  * @param radius inclusive euclidean match distance
  * @param extent coordinate-space width/height (grid sizing only —
  *   correctness never depends on it)
  */
object DistanceJoin {

  def distanceJoin(src: DataFrame, tgt: DataFrame, radius: Double,
                   extent: Double = 1000.0): DataFrame = {
    require(radius > 0, "radius must be positive")
    // One dim-side count sizes the grid (same one-job contract as θ's
    // stats collect and the kNN grid).
    val n = math.max(1L, tgt.count())
    val maxCells = math.max(1L, math.floor(extent / radius).toLong) // g >= radius
    val ncells = math.min(maxCells, math.max(1L, math.ceil(math.sqrt(n / 2.0)).toLong))
    val g = extent / ncells

    def cell(c: Column): Column =
      least(greatest(floor(c / g), lit(0)), lit(ncells - 1)).cast("long")

    val t = tgt.select(col("tgt_id"), col("x").as("tx"), col("y").as("ty"),
      cell(col("x")).as("tcx"), cell(col("y")).as("tcy"))
    val sCells = src
      .select(col("src_id"), col("x").as("sx"), col("y").as("sy"),
        cell(col("x")).as("scx"), cell(col("y")).as("scy"))
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

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared banded-LSH candidate generation (dd8 hyperplane bands, dd11
  * SimHash bands): explode a packed signature long into per-band
  * sub-signatures and self-join — a pair is a candidate when ANY band
  * matches. Only narrow (id, band, bsig) rows flow through the
  * explode and join; payloads (vectors, signatures) join back at the
  * caller's verification step, so candidate cost is bounded by
  * band-bucket sizes at any scale. */
object Banding {

  /** The exploded (id, band, bsig) rows — one row per band per input,
    * sub-signature = bitsPerBand bits shifted out of the packed long
    * (arithmetic shift + mask, so the sign bit of a 64-plane signature
    * is handled identically to DuckDB's BIGINT `>> … & mask`). */
  def banded(sigs: DataFrame, idCol: String, sigCol: String,
             bands: Int, bitsPerBand: Int): DataFrame = {
    val mask = (1L << bitsPerBand) - 1
    sigs.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        shiftright(col(sigCol), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bsig"))
  }

  def candidates(sigs: DataFrame, idCol: String, sigCol: String,
                 bands: Int, bitsPerBand: Int): DataFrame = {
    val b = banded(sigs, idCol, sigCol, bands, bitsPerBand)
    b.as("a")
      .join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Asymmetric (probe-side) candidate generation: only rows passing
    * `isQuery` band-join against the full corpus — the range/top-k
    * search shape where the query set is a small fraction of the data,
    * so the left arm of the band join is tiny rather than the whole
    * banded table twice. Emits (q_id, n_id) with q_id ≠ n_id. */
  def probeCandidates(sigs: DataFrame, idCol: String, sigCol: String,
                      bands: Int, bitsPerBand: Int,
                      isQuery: org.apache.spark.sql.Column): DataFrame = {
    val b = banded(sigs, idCol, sigCol, bands, bitsPerBand)
    val qb = sigs.filter(isQuery)
      .select(col(idCol).as("q_id"), col(sigCol).as("qsig"))
    banded(qb, "q_id", "qsig", bands, bitsPerBand).as("a")
      .join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.q_id") =!= col(s"b.$idCol"))
      .select(col("a.q_id").as("q_id"), col(s"b.$idCol").as("n_id"))
      .distinct()
  }
}

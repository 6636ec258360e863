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

  def candidates(sigs: DataFrame, idCol: String, sigCol: String,
                 bands: Int, bitsPerBand: Int): DataFrame = {
    val mask = (1L << bitsPerBand) - 1
    val banded = sigs.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        shiftright(col(sigCol), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .select(col(idCol), col("pos").as("band"), col("col").as("bsig"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }
}

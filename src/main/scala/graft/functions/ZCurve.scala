package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) space-filling curve over integer grid coordinates —
  * the storage-layout primitive for spatial data at rest. Sorting a
  * 100 TB table by `zValue` before writing gives every parquet file a
  * tight min/max range on ONE long column; any query tile then prunes
  * files through ordinary column statistics, with no spatial index
  * structure to build, ship, or keep consistent. (Same role as the
  * reference's on-read tiling — DS-JedAI `utils/TilingScheme` assigns
  * tiles per job — but applied to the at-rest layout so the pruning
  * happens before a single byte is read.)
  *
  * Built from codegen'd bit arithmetic (`shiftright`/`&`/`shiftleft`
  * folded over literal bit positions) — no UDF, constant-folded per
  * row inside whole-stage codegen.
  */
object ZCurve {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a single z-value. Inputs must be non-negative and
    * < 2^bits; 31 bits max per axis keeps the result in a long. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Scala-side z-value for literals (query-tile bounds). */
  def zValueOf(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  /** Inverse: (x, y) from a z-value — for tests and range splitting. */
  def unZValueOf(z: Long, bits: Int): (Long, Long) = {
    var x = 0L; var y = 0L
    (0 until bits).foreach { i =>
      x |= ((z >> (2 * i)) & 1L) << i
      y |= ((z >> (2 * i + 1)) & 1L) << i
    }
    (x, y)
  }

  /** The DuckDB-expressible twin of [[zValue]] (same arithmetic). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster a frame for writing: range-partition then sort by the
    * z-value of (xCol, yCol). Each output partition (→ parquet file)
    * covers a disjoint z-range, so file-level min/max statistics on
    * the single `zval` column prune aligned query tiles exactly. */
  def layoutByZ(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
                numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("zval", zValue(xCol, yCol, bits))
    withZ.repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}

package graft.partition

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeomFunctions.st_predicate

/** Sample-based spatial range partitioning — the capability of the
  * reference's Sedona-backed GridPartitioner (DS-JedAI
  * `utils/readers/GridPartitioner.scala` P2-P4): build KD-split
  * regions from a sample of geometry centers, expand the outer
  * borders to cover the whole plane (P3), replicate each geometry to
  * every overlapping region (P4), and join co-located regions with
  * reference-point dedup.
  *
  * The θ-tile equi-join remains the engine's default join path;
  * region partitioning is the storage-layout tool — persisting both
  * relations partitioned by the same region set makes repeated joins
  * co-located (the bucketing analogue for spatial keys), and region
  * sizes adapt to data density where the uniform θ-grid cannot.
  */
object SpatialPartitioner {

  /** A leaf region of the KD split; borders of the outermost regions
    * are pushed to ±∞ so the regions tile the plane. */
  case class Region(id: Int, minx: Double, miny: Double, maxx: Double, maxy: Double)

  /** Recursive median KD split of sampled MBR centers into ~n leaf
    * regions (rounded down to a power of two). One sampling job. */
  def regions(source: DataFrame, n: Int, sampleSize: Int = 10000): Seq[Region] = {
    val total = source.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(1, total))
    val centers = source
      .sample(withReplacement = false, fraction, seed = 42)
      .select(((col("minx") + col("maxx")) / 2).as("cx"),
              ((col("miny") + col("maxy")) / 2).as("cy"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val depth = math.max(0, (math.log(n) / math.log(2)).toInt)
    val inf = Double.MaxValue
    def split(pts: Array[(Double, Double)], d: Int,
              minx: Double, miny: Double, maxx: Double, maxy: Double): Seq[(Double, Double, Double, Double)] =
      if (d == 0 || pts.length < 2) Seq((minx, miny, maxx, maxy))
      else {
        val byX = (maxx - minx) >= (maxy - miny)
        val sorted = if (byX) pts.sortBy(_._1) else pts.sortBy(_._2)
        val mid = sorted(sorted.length / 2)
        if (byX) {
          val m = mid._1
          split(sorted.take(sorted.length / 2), d - 1, minx, miny, m, maxy) ++
          split(sorted.drop(sorted.length / 2), d - 1, m, miny, maxx, maxy)
        } else {
          val m = mid._2
          split(sorted.take(sorted.length / 2), d - 1, minx, miny, maxx, m) ++
          split(sorted.drop(sorted.length / 2), d - 1, minx, m, maxx, maxy)
        }
      }
    split(centers, depth, -inf, -inf, inf, inf).zipWithIndex.map {
      case ((x0, y0, x1, y1), i) => Region(i, x0, y0, x1, y1)
    }
  }

  /** Region-partitioned spatial join: both sides replicated to the
    * SAME region set, equi-joined on region id, MBR-filtered, deduped
    * by the region containing the reference point (regions are
    * disjoint, so each pair survives exactly once), then verified. */
  def joinByRegions(source: DataFrame, target: DataFrame, relation: String,
                    n: Int = 16): DataFrame = {
    val spark = source.sparkSession
    val regs = regions(source, n)
    val regDf = broadcast(spark.createDataFrame(regs))
    def replicate(df: DataFrame, p: String): DataFrame = {
      val prefixed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
      prefixed.join(regDf,
        col(s"${p}minx") <= col("maxx") && col(s"${p}maxx") >= col("minx") &&
        col(s"${p}miny") <= col("maxy") && col(s"${p}maxy") >= col("miny"))
        .withColumnRenamed("id", "rid")
        .drop("minx", "miny", "maxx", "maxy")
    }
    val s = replicate(source, "s_")
    val t = replicate(target, "t_").withColumnRenamed("rid", "rid_t")
    val rx = greatest(col("s_minx"), col("t_minx"))
    val ry = greatest(col("s_miny"), col("t_miny"))
    val regBounds = spark.createDataFrame(regs).select(
      col("id").as("rid"), col("minx").as("rb_minx"), col("miny").as("rb_miny"),
      col("maxx").as("rb_maxx"), col("maxy").as("rb_maxy"))
    s.join(t, col("rid") === col("rid_t"))
      .filter(
        col("s_minx") <= col("t_maxx") && col("s_maxx") >= col("t_minx") &&
        col("s_miny") <= col("t_maxy") && col("s_maxy") >= col("t_miny"))
      .join(broadcast(regBounds), "rid")
      .filter(rx >= col("rb_minx") && rx < col("rb_maxx") &&
              ry >= col("rb_miny") && ry < col("rb_maxy"))
      .filter(st_predicate(col("s_geom"), col("t_geom"), relation))
      .select(col("s_id"), col("t_id"))
  }
}

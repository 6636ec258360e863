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

  /** Sampled MBR centers — one job, bounded collect (≤ sampleSize
    * rows), shared by both region builders. */
  private def sampleCenters(source: DataFrame,
                            sampleSize: Int): Array[(Double, Double)] = {
    val total = source.count()
    val fraction = math.min(1.0, sampleSize.toDouble / math.max(1, total))
    source
      .sample(withReplacement = false, fraction, seed = 42)
      .select(((col("minx") + col("maxx")) / 2).as("cx"),
              ((col("miny") + col("maxy")) / 2).as("cy"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
  }

  /** Recursive median KD split of sampled MBR centers into ~n leaf
    * regions (rounded down to a power of two). One sampling job. */
  def regions(source: DataFrame, n: Int, sampleSize: Int = 10000): Seq[Region] = {
    val centers = sampleCenters(source, sampleSize)
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

  /** Sample-based QUADTREE regions (the reference's other grid type,
    * `utils/readers/GridPartitioner.scala:23-30`): a node splits into
    * four equal quadrants at its center while it holds more than
    * `capacity` sampled centers (capacity ≈ sample/n, so leaf count ≈
    * n where density demands it), then leaves on the sample bounding
    * box's border are pushed to ±∞ so the regions tile the plane
    * (same P3 border expansion as the KD form). Quadrant splits are
    * half-open [min, mid), matching joinByRegions' half-open
    * reference-point dedup — sibling edges share the exact same mid
    * coordinate, so the leaves are provably disjoint and covering.
    * The depth guard stops pathological samples (all centers equal)
    * from recursing forever. */
  def quadRegions(source: DataFrame, n: Int, sampleSize: Int = 10000): Seq[Region] = {
    val inf = Double.MaxValue
    val centers = sampleCenters(source, sampleSize)
    if (centers.isEmpty) return Seq(Region(0, -inf, -inf, inf, inf))
    val rx0 = centers.map(_._1).min; val rx1 = centers.map(_._1).max
    val ry0 = centers.map(_._2).min; val ry1 = centers.map(_._2).max
    // nudge the root's max edge outward so max-coordinate centers fall
    // inside a half-open leaf (border leaves expand to ∞ anyway)
    val ex1 = math.nextUp(rx1); val ey1 = math.nextUp(ry1)
    val capacity = math.max(1,
      math.ceil(centers.length.toDouble / math.max(1, n)).toInt)
    val maxDepth = 16
    def split(pts: Array[(Double, Double)], d: Int,
              x0: Double, y0: Double, x1: Double, y1: Double)
        : Seq[(Double, Double, Double, Double)] =
      if (pts.length <= capacity || d >= maxDepth) Seq((x0, y0, x1, y1))
      else {
        val mx = x0 / 2 + x1 / 2; val my = y0 / 2 + y1 / 2
        val (lo, hi) = pts.partition(_._1 < mx)
        val (ll, lh) = lo.partition(_._2 < my)
        val (hl, hh) = hi.partition(_._2 < my)
        split(ll, d + 1, x0, y0, mx, my) ++ split(lh, d + 1, x0, my, mx, y1) ++
        split(hl, d + 1, mx, y0, x1, my) ++ split(hh, d + 1, mx, my, x1, y1)
      }
    split(centers, 0, rx0, ry0, ex1, ey1).zipWithIndex.map {
      case ((x0, y0, x1, y1), i) => Region(i,
        if (x0 == rx0) -inf else x0, if (y0 == ry0) -inf else y0,
        if (x1 == ex1) inf else x1, if (y1 == ey1) inf else y1)
    }
  }

  /** Region-partitioned spatial join: both sides replicated to the
    * SAME region set, equi-joined on region id, MBR-filtered, deduped
    * by the region containing the reference point (regions are
    * disjoint, so each pair survives exactly once), then verified. */
  def joinByRegions(source: DataFrame, target: DataFrame, relation: String,
                    n: Int = 16, gridType: String = "KDBTREE"): DataFrame = {
    val spark = source.sparkSession
    val regs = gridType.toUpperCase match {
      case "KDBTREE" => regions(source, n)
      case "QUADTREE" => quadRegions(source, n)
      case other => throw new IllegalArgumentException(
        s"unknown gridType '$other' (KDBTREE | QUADTREE)")
    }
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

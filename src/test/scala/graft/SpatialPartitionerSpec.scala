package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.partition.SpatialPartitioner
import graft.operators.SpatialJoin

class SpatialPartitionerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private def entitiesDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
  }
  private val source = TestGeoms.corpus(seed = 51, n = 120, world = 90)
  private val target = TestGeoms.corpus(seed = 52, n = 90, world = 90)

  test("KD regions are disjoint and tile the plane") {
    val regs = SpatialPartitioner.regions(entitiesDf(source), 16)
    assert(regs.size >= 8)
    // every probe point falls in exactly one region (half-open borders)
    val rnd = new scala.util.Random(1)
    (0 until 500).foreach { _ =>
      val x = rnd.nextDouble() * 90; val y = rnd.nextDouble() * 90
      val hits = regs.count(r => x >= r.minx && x < r.maxx && y >= r.miny && y < r.maxy)
      assert(hits === 1, s"point ($x,$y) in $hits regions")
    }
  }

  test("region-partitioned join equals the tile join") {
    val viaRegions = SpatialPartitioner.joinByRegions(
      entitiesDf(source), entitiesDf(target), "intersects", n = 8)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaTiles = SpatialJoin.relate(entitiesDf(source), entitiesDf(target), "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaRegions === viaTiles)
  }

  test("QUADTREE regions are disjoint and tile the plane") {
    val regs = SpatialPartitioner.quadRegions(entitiesDf(source), 16)
    assert(regs.size >= 4)
    val rnd = new scala.util.Random(2)
    (0 until 500).foreach { _ =>
      // probe points both inside and far outside the sample bbox —
      // the ∞-expanded border leaves must cover the whole plane
      val x = (rnd.nextDouble() - 0.25) * 300
      val y = (rnd.nextDouble() - 0.25) * 300
      val hits = regs.count(r => x >= r.minx && x < r.maxx && y >= r.miny && y < r.maxy)
      assert(hits === 1, s"point ($x,$y) in $hits regions")
    }
  }

  test("QUADTREE degenerate sample (all centers equal) terminates with " +
       "one plane-covering region") {
    val dot = (0 until 40).map(i => (s"d$i", "POLYGON((5 5, 6 5, 6 6, 5 6, 5 5))"))
    val regs = SpatialPartitioner.quadRegions(entitiesDf(dot), 8)
    assert(regs.nonEmpty)
    val hits = regs.count(r =>
      5.5 >= r.minx && 5.5 < r.maxx && 5.5 >= r.miny && 5.5 < r.maxy)
    assert(hits === 1)
  }

  test("QUADTREE region join equals the tile join") {
    val viaQuad = SpatialPartitioner.joinByRegions(
      entitiesDf(source), entitiesDf(target), "intersects", n = 8,
      gridType = "QUADTREE")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaTiles = SpatialJoin.relate(entitiesDf(source), entitiesDf(target), "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaQuad === viaTiles)
  }
}

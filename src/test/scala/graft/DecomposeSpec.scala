package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader
import graft.geometry.Decompose
import graft.operators.SpatialJoin

/** Decomposition invariants (ported policy from the reference's
  * DecompositionTest ideas, new corpus) + end-to-end equivalence of
  * the fine-grained-envelope and segmented join paths.
  */
class DecomposeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private val rd = new WKTReader()
  private val rnd = new scala.util.Random(3)
  private val polys = (0 until 25).map { i =>
    rd.read(TestGeoms.starPolygon(rnd, 10 + rnd.nextDouble() * 40,
      10 + rnd.nextDouble() * 40, 3 + rnd.nextDouble() * 10))
  }
  private val lines = (0 until 15).map { i =>
    rd.read(TestGeoms.lineString(rnd, 10 + rnd.nextDouble() * 40,
      10 + rnd.nextDouble() * 40, 12))
  }

  test("grid decomposition preserves area and length") {
    polys.foreach { g =>
      val segs = Decompose.gridSegments(g, 5.0, 5.0).map(_._3)
      assert(math.abs(segs.map(_.getArea).sum - g.getArea) < 1e-6)
    }
    lines.foreach { g =>
      val segs = Decompose.gridSegments(g, 5.0, 5.0).map(_._3)
      assert(math.abs(segs.map(_.getLength).sum - g.getLength) < 1e-6)
    }
  }

  test("every grid segment lies within its tile") {
    polys.foreach { g =>
      Decompose.gridSegments(g, 5.0, 5.0).foreach { case (tx, ty, seg) =>
        val e = seg.getEnvelopeInternal
        val eps = 1e-9
        assert(e.getMinX >= tx * 5.0 - eps && e.getMaxX <= (tx + 1) * 5.0 + eps)
        assert(e.getMinY >= ty * 5.0 - eps && e.getMaxY <= (ty + 1) * 5.0 + eps)
      }
    }
  }

  test("recursive decomposition preserves area and bounds piece size") {
    polys.foreach { g =>
      val pieces = Decompose.recursive(g, 2.0, 2.0, 2.0)
      assert(math.abs(pieces.map(_.getArea).sum - g.getArea) < 1e-6)
      pieces.foreach { p =>
        val e = p.getEnvelopeInternal
        assert(e.getWidth <= 2.0 * 2.0 + 1e-9 && e.getHeight <= 2.0 * 2.0 + 1e-9)
      }
    }
  }

  test("refined envelopes are contained in the MBR and cover the geometry") {
    polys.foreach { g =>
      val envs = Decompose.refinedEnvelopes(g, 4.0, 64)
      val mbr = g.getEnvelopeInternal
      envs.foreach { e =>
        assert(e.getMinX >= mbr.getMinX - 1e-9 && e.getMaxX <= mbr.getMaxX + 1e-9)
      }
      // union of refined envelopes covers every vertex
      g.getCoordinates.foreach { c =>
        assert(envs.exists(e => e.covers(c)), s"vertex $c not covered")
      }
    }
  }

  private def entitiesDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
  }
  private val source = TestGeoms.corpus(seed = 41, n = 70, world = 80)
  private val target = TestGeoms.corpus(seed = 42, n = 60, world = 80)

  test("fine-grained envelope join: same qualifying pairs, fewer or " +
       "equal verifications") {
    val plain = SpatialJoin.de9im(entitiesDf(source), entitiesDf(target))
    val fine = SpatialJoin.de9imFineGrained(entitiesDf(source), entitiesDf(target))
    def qualifying(df: DataFrame) = df.filter(col("intersects"))
      .select("s_id", "t_id", "de9im").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(qualifying(fine) === qualifying(plain))
    assert(fine.count() <= plain.count())
  }

  test("precision reduction snaps coordinates and preserves validity") {
    import spark.implicits._
    import graft.functions.GeomFunctions._
    val noisy = Seq(
      ("a", "POLYGON((0.100000000001 0, 4.2999999999 0, 4.3 4.1, 0.1 4.1, 0.100000000001 0))"),
      ("b", "POINT(1.23456789 9.87654321)"))
    val out = SpatialJoin.entities(noisy.toDF("id", "wkt"), col("id"), col("wkt"))
      .withColumn("geom", st_reduce_precision(col("geom"), 1e6))
      .collect().map { r =>
        r.getString(0) -> graft.functions.Jts.fromWkb(r.getAs[Array[Byte]]("geom"))
      }.toMap
    assert(out("a").isValid)
    val p = out("b").getCoordinate
    assert(p.x === 1.234568 && p.y === 9.876543) // snapped to 1e-6 grid
  }

  test("per-partition verification stats sum to the total pair count " +
       "and carry wall-time + heaviest-blob diagnostics") {
    val (result, stats) = SpatialJoin.de9imWithStats(entitiesDf(source), entitiesDf(target))
    assert(stats.values.map(_.verifications).sum === result.count())
    assert(stats.nonEmpty)
    assert(stats.values.forall(s => s.wallMillis > 0.0))
    assert(stats.values.filter(_.verifications > 0).forall(_.maxGeomBytes > 0))
  }

  test("segmented intersects join equals the whole-geometry join") {
    val plain = SpatialJoin.relate(entitiesDf(source), entitiesDf(target), "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val seg = SpatialJoin.relateSegmented(entitiesDf(source), entitiesDf(target))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(seg === plain)
  }

  test("flatten explodes collections into members and keeps atoms intact") {
    val rdp = new WKTReader()
    val mp = rdp.read(TestGeoms.multiPolygon(new scala.util.Random(7), 10, 10, 3))
    val members = Decompose.flatten(mp)
    assert(members.length === mp.getNumGeometries && members.length > 1)
    assert(math.abs(members.map(_.getArea).sum - mp.getArea) < 1e-9)
    members.foreach(m => assert(m.getGeometryType === "Polygon"))
    val gc = rdp.read("GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0, 2 2), " +
      "POLYGON((0 0, 3 0, 3 3, 0 3, 0 0)))")
    assert(Decompose.flatten(gc).map(_.getGeometryType) ===
      Seq("Point", "LineString", "Polygon"))
    val atom = rdp.read("POINT(5 5)")
    assert(Decompose.flatten(atom) === Seq(atom))
  }
}

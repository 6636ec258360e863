package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SpatialJoin
import graft.sources.Jitter

class JitterSpec extends AnyFunSuite {
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

  private val corpus = TestGeoms.corpus(seed = 11, n = 40, world = 50)

  test("jittered copies: one row per (entity, copy), unique suffixed ids") {
    val out = Jitter.jitteredCopies(entitiesDf(corpus), times = 3)
    assert(out.count() === corpus.length * 3)
    assert(out.select("id").distinct().count() === corpus.length * 3)
    val ids = out.select("id").collect().map(_.getString(0))
    assert(ids.forall(_.matches(".*~[123]$")))
  }

  test("jitter is deterministic per seed and differs across seeds") {
    val a = Jitter.jitteredCopies(entitiesDf(corpus), 2, seed = 7)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val b = Jitter.jitteredCopies(entitiesDf(corpus), 2, seed = 7)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val c = Jitter.jitteredCopies(entitiesDf(corpus), 2, seed = 8)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(a === b, "same seed must reproduce the corpus bit-identically")
    assert(a.map(_._2) !== c.map(_._2), "different seed must perturb differently")
  }

  test("polygons with holes keep their holes (shell and interior rings " +
       "jitter as separate rings)") {
    val holed = Seq(("h1",
      "POLYGON((0 0, 100 0, 100 100, 0 100, 0 0), (40 40, 60 40, 60 60, 40 60, 40 40))"))
    val out = Jitter.jitteredCopies(entitiesDf(holed), times = 3)
      .collect().map(_.getString(1))
    val rd = new org.locationtech.jts.io.WKTReader()
    out.foreach { wkt =>
      val g = rd.read(wkt).asInstanceOf[org.locationtech.jts.geom.Polygon]
      assert(g.getNumInteriorRing === 1, "hole must survive the jitter")
      assert(g.getExteriorRing.getNumPoints === 5)
    }
  }

  test("jittered geometries keep their type, move, and feed back " +
       "through the entity loader") {
    val rd = new org.locationtech.jts.io.WKTReader()
    val orig = corpus.toMap
    val out = Jitter.jitteredCopies(entitiesDf(corpus), 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (id, wkt) =>
      val g = rd.read(wkt)
      val o = rd.read(orig(id.stripSuffix("~1")))
      assert(g.getGeometryType === o.getGeometryType, id)
      assert(g.getNumPoints === o.getNumPoints, id)
      assert(!g.equalsExact(o), s"$id did not move")
    }
    // round-trip: the jittered corpus loads as entities and joins
    import spark.implicits._
    val reloaded = SpatialJoin.entities(
      out.toSeq.toDF("id", "wkt"), col("id"), col("wkt"))
    assert(reloaded.count() > 0)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.io.WKTReader

/** Edge-case guards on Jitter.transform: empty geometries pass through
  * instead of throwing, top-level LinearRings jitter as closed rings,
  * and single-member GeometryCollections recurse into their member
  * (previously both fell through to the identity arm). */
class JitterEdgeSpec extends AnyFunSuite {
  private val rd = new WKTReader()
  private def rng(seed: Long) = new scala.util.Random(seed)

  test("empty geometries pass through unperturbed, without throwing") {
    for (wkt <- Seq("POINT EMPTY", "POLYGON EMPTY", "MULTIPOLYGON EMPTY",
                    "GEOMETRYCOLLECTION EMPTY")) {
      val g = rd.read(wkt)
      val out = Jitter.transform(g, rng(1))
      assert(out.isEmpty, wkt)
      assert(out.getGeometryType === g.getGeometryType, wkt)
    }
  }

  test("top-level LinearRing jitters and stays a closed ring") {
    val r = rd.read("LINEARRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    val out = Jitter.transform(r, rng(2))
    assert(out.getGeometryType === "LinearRing")
    assert(!out.equalsExact(r), "ring did not move")
    val cs = out.getCoordinates
    assert(cs.head.equals2D(cs.last), "ring must stay closed")
    assert(out.getNumPoints === r.getNumPoints)
  }

  test("single-member GeometryCollection recurses into its member") {
    val c = rd.read("GEOMETRYCOLLECTION (POINT (3 4))")
    val out = Jitter.transform(c, rng(3))
    assert(out.getGeometryType === "GeometryCollection")
    assert(out.getNumGeometries === 1)
    assert(!out.getGeometryN(0).equalsExact(c.getGeometryN(0)),
      "collection member did not move")
  }

  test("mixed multi-member collection moves every member") {
    val c = rd.read(
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 5 5), " +
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)))")
    val out = Jitter.transform(c, rng(4))
    assert(out.getNumGeometries === 3)
    (0 until 3).foreach { i =>
      assert(out.getGeometryN(i).getGeometryType === c.getGeometryN(i).getGeometryType)
      assert(!out.getGeometryN(i).equalsExact(c.getGeometryN(i)), s"member $i")
    }
  }

  test("rowSeed: 64-bit md5 fold separates ids that collide on String.hashCode") {
    // "Aa" and "BB" are the classic String.hashCode collision pair
    assert("Aa".hashCode === "BB".hashCode)
    assert(Jitter.rowSeed(42L, 1, "Aa") !== Jitter.rowSeed(42L, 1, "BB"))
    // deterministic
    assert(Jitter.rowSeed(42L, 1, "Aa") === Jitter.rowSeed(42L, 1, "Aa"))
  }
}

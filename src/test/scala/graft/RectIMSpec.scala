package graft

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import graft.geometry.RectIM

/** Differential test: analytic rectangle DE-9IM == JTS relate, over an
  * integer-coordinate corpus where touching, containment, equality and
  * collinear-edge cases are dense, plus targeted canonical cases.
  */
class RectIMSpec extends AnyFunSuite {
  private val gf = new GeometryFactory()
  private def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
    gf.createPolygon(Array(
      new Coordinate(x0, y0), new Coordinate(x1, y0),
      new Coordinate(x1, y1), new Coordinate(x0, y1), new Coordinate(x0, y0)))

  private def check(ax0: Int, ay0: Int, ax1: Int, ay1: Int,
                    bx0: Int, by0: Int, bx1: Int, by1: Int): Unit = {
    val expected = rect(ax0, ay0, ax1, ay1).relate(rect(bx0, by0, bx1, by1)).toString
    val got = RectIM.matrix(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    assert(got === expected,
      s"A=($ax0,$ay0,$ax1,$ay1) B=($bx0,$by0,$bx1,$by1)")
  }

  test("canonical cases match JTS") {
    check(0, 0, 4, 4, 0, 0, 4, 4)   // equal
    check(1, 1, 2, 2, 0, 0, 4, 4)   // strictly within
    check(0, 0, 4, 4, 1, 1, 2, 2)   // strictly contains
    check(0, 1, 2, 2, 0, 0, 4, 4)   // within, shared edge
    check(0, 0, 2, 2, 2, 0, 4, 2)   // touch full edge
    check(0, 0, 2, 2, 2, 2, 4, 4)   // touch corner
    check(0, 0, 2, 2, 2, 1, 4, 5)   // touch partial edge
    check(0, 0, 3, 3, 2, 2, 5, 5)   // partial overlap
    check(0, 0, 3, 3, 2, 0, 5, 3)   // overlap, collinear top/bottom
    check(0, 0, 9, 9, 10, 0, 12, 2) // disjoint
    check(0, 0, 4, 2, 1, 0, 3, 5)   // cross (plus-sign overlap)
  }

  test("20k random integer rectangle pairs match JTS relate") {
    val rnd = new scala.util.Random(13)
    def randRect(): (Int, Int, Int, Int) = {
      val x0 = rnd.nextInt(10); val y0 = rnd.nextInt(10)
      (x0, y0, x0 + 1 + rnd.nextInt(6), y0 + 1 + rnd.nextInt(6))
    }
    (0 until 20000).foreach { _ =>
      val (a0, a1, a2, a3) = randRect(); val (b0, b1, b2, b3) = randRect()
      check(a0, a1, a2, a3, b0, b1, b2, b3)
    }
  }
}

package graft.geometry

/** Analytic DE-9IM for axis-aligned rectangles (positive area).
  *
  * JTS `relate` builds a full topology graph per pair (~100-400µs);
  * for two rectangles every matrix entry is decidable from interval
  * arithmetic in nanoseconds. Bounding-box joins are the dominant
  * shape in large-scale spatial pipelines, so the verification
  * expression short-circuits to this when both operands are
  * rectangles. Equality with JTS `relate` is property-tested over
  * integer-coordinate corpora where touching/containment/equality
  * cases are dense.
  *
  * Entry order: II IB IE / BI BB BE / EI EB EE.
  */
object RectIM {

  /** DE-9IM string for rectangles a, b. */
  def matrix(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
             bx0: Double, by0: Double, bx1: Double, by1: Double): String = {
    val ox = math.min(ax1, bx1) - math.max(ax0, bx0)
    val oy = math.min(ay1, by1) - math.max(ay0, by0)
    if (ox < 0 || oy < 0) return "FF2FF1212" // disjoint

    if (ox == 0 || oy == 0) {
      // boundary touch only: corner (dim 0) or edge segment (dim 1)
      val bb = if (ox == 0 && oy == 0) '0' else '1'
      return s"FF2F${bb}1212"
    }

    // interiors overlap (ox > 0 && oy > 0)
    val aInB = ax0 >= bx0 && ax1 <= bx1 && ay0 >= by0 && ay1 <= by1
    val bInA = bx0 >= ax0 && bx1 <= ax1 && by0 >= ay0 && by1 <= ay1
    val aStrictlyInB = ax0 > bx0 && ax1 < bx1 && ay0 > by0 && ay1 < by1
    val bStrictlyInA = bx0 > ax0 && bx1 < ax1 && by0 > ay0 && by1 < ay1

    // does an edge of r2 pass through r1's interior?
    def edgeInInterior(r1x0: Double, r1y0: Double, r1x1: Double, r1y1: Double,
                       r2x0: Double, r2y0: Double, r2x1: Double, r2y1: Double): Boolean = {
      val yOpen = math.min(r1y1, r2y1) > math.max(r1y0, r2y0)
      val xOpen = math.min(r1x1, r2x1) > math.max(r1x0, r2x0)
      val vert = yOpen && ((r2x0 > r1x0 && r2x0 < r1x1) || (r2x1 > r1x0 && r2x1 < r1x1))
      val horiz = xOpen && ((r2y0 > r1y0 && r2y0 < r1y1) || (r2y1 > r1y0 && r2y1 < r1y1))
      vert || horiz
    }

    val ib = edgeInInterior(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
    val bi = edgeInInterior(bx0, by0, bx1, by1, ax0, ay0, ax1, ay1)

    // collinear boundary overlap of positive length?
    val collinear =
      (((ax0 == bx0 || ax0 == bx1 || ax1 == bx0 || ax1 == bx1) && oy > 0) ||
       ((ay0 == by0 || ay0 == by1 || ay1 == by0 || ay1 == by1) && ox > 0))
    val bb: Char =
      if (collinear) '1'
      else if (aStrictlyInB || bStrictlyInA) 'F'
      else '0' // boundaries cross at isolated points

    val s = new StringBuilder(9)
    s += '2'                       // II
    s += (if (ib) '1' else 'F')    // IB
    s += (if (aInB) 'F' else '2')  // IE
    s += (if (bi) '1' else 'F')    // BI
    s += bb                        // BB
    s += (if (aInB) 'F' else '1')  // BE
    s += (if (bInA) 'F' else '2')  // EI
    s += (if (bInA) 'F' else '1')  // EB
    s += '2'                       // EE
    s.toString
  }
}

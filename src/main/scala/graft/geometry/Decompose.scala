package graft.geometry

import org.locationtech.jts.geom.{Envelope, Geometry, GeometryFactory}
import graft.functions.Jts

/** Geometry decomposition — the capability of DS-JedAI's decompose
  * package (D1 `RecursiveDecomposer`, D2 `GridDecomposer`,
  * D3 `EnvelopeRefiner`), re-implemented on JTS set operations instead
  * of the reference's hand-rolled blade/edge-walk math: a segment is
  * the JTS intersection of the geometry with a clip rectangle. This
  * trades a little CPU for far less code and inherits JTS's robustness
  * fixes; invariants (area/length preservation, one-tile alignment,
  * envelope tightening) are property-tested.
  */
object Decompose {

  private def f: GeometryFactory = Jts.factory

  private def clipRect(minx: Double, miny: Double, maxx: Double, maxy: Double): Geometry =
    f.toGeometry(new Envelope(minx, maxx, miny, maxy))

  private def clip(g: Geometry, minx: Double, miny: Double,
                   maxx: Double, maxy: Double): Option[Geometry] = {
    val c = g.intersection(clipRect(minx, miny, maxx, maxy))
    if (c.isEmpty) None else Some(c)
  }

  /** D2: split along every θ-grid line — each output segment lies in
    * exactly one tile. Returns (tileX, tileY, segment). */
  def gridSegments(g: Geometry, thetaX: Double, thetaY: Double): Seq[(Long, Long, Geometry)] = {
    val env = g.getEnvelopeInternal
    val x0 = math.floor(env.getMinX / thetaX).toLong
    val x1 = math.floor(env.getMaxX / thetaX).toLong
    val y0 = math.floor(env.getMinY / thetaY).toLong
    val y1 = math.floor(env.getMaxY / thetaY).toLong
    if (x0 == x1 && y0 == y1) return Seq((x0, y0, g)) // fits one tile
    for {
      tx <- x0 to x1
      ty <- y0 to y1
      seg <- clip(g, tx * thetaX, ty * thetaY, (tx + 1) * thetaX, (ty + 1) * thetaY)
    } yield (tx, ty, seg)
  }

  /** D1: recursively bisect (midpoint of the longer θ-relative axis)
    * until each piece's extent is at most `t` θ-cells. */
  def recursive(g: Geometry, thetaX: Double, thetaY: Double, t: Double): Seq[Geometry] = {
    val env = g.getEnvelopeInternal
    val wCells = env.getWidth / thetaX
    val hCells = env.getHeight / thetaY
    if (wCells <= t && hCells <= t) Seq(g)
    else if (wCells >= hCells) {
      val mid = (env.getMinX + env.getMaxX) / 2
      clip(g, env.getMinX, env.getMinY, mid, env.getMaxY).toSeq.flatMap(recursive(_, thetaX, thetaY, t)) ++
      clip(g, mid, env.getMinY, env.getMaxX, env.getMaxY).toSeq.flatMap(recursive(_, thetaX, thetaY, t))
    } else {
      val mid = (env.getMinY + env.getMaxY) / 2
      clip(g, env.getMinX, env.getMinY, env.getMaxX, mid).toSeq.flatMap(recursive(_, thetaX, thetaY, t)) ++
      clip(g, env.getMinX, mid, env.getMaxX, env.getMaxY).toSeq.flatMap(recursive(_, thetaX, thetaY, t))
    }
  }

  /** D3: fine-grained envelopes — per vertical θ-slab envelope of the
    * clipped geometry (no geometry splitting survives; only tighter
    * boxes). `maxEnvs` caps the list; above it the plain MBR is used,
    * bounding both memory and filter cost. */
  def refinedEnvelopes(g: Geometry, thetaX: Double, maxEnvs: Int): Seq[Envelope] = {
    val env = g.getEnvelopeInternal
    val x0 = math.floor(env.getMinX / thetaX).toLong
    val x1 = math.floor(env.getMaxX / thetaX).toLong
    val n = (x1 - x0 + 1).toInt
    if (n <= 1 || n > maxEnvs) return Seq(env)
    (x0 to x1).flatMap { tx =>
      clip(g, tx * thetaX, env.getMinY, (tx + 1) * thetaX, env.getMaxY)
        .map(_.getEnvelopeInternal)
    }
  }

  /** D5: flatten GeometryCollections into members (reference
    * `GeometryUtils.scala:26-37`). */
  def flatten(g: Geometry): Seq[Geometry] =
    (0 until g.getNumGeometries).map(g.getGeometryN)
}

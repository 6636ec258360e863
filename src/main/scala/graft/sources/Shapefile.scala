package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, LinearRing}
import org.locationtech.jts.algorithm.Orientation

/** Minimal ESRI Shapefile (.shp) record parser — the reference's S4
  * capability (DS-JedAI `utils/readers/Reader.scala:150-155`, which
  * returns null upstream; re-implemented here from the public format
  * specification, "ESRI Shapefile Technical Description", 1998).
  *
  * Layout: a 100-byte header (file code 9994 big-endian at offset 0,
  * shape type little-endian at 32), then records of
  * `[recordNumber:int BE][contentWords:int BE][content]` where content
  * starts with a little-endian shape type. Base 2-D types are parsed;
  * Z/M variants share the base layout with measure arrays appended, so
  * they parse as their 2-D projection. Null shapes (type 0) and
  * truncated trailing records are skipped.
  *
  * Polygon semantics per spec: shells are clockwise rings, holes
  * counter-clockwise; holes are attached to the first shell whose ring
  * contains them. Files that ignore the orientation rule (all rings
  * CCW) degrade gracefully: every ring becomes a shell.
  */
object Shapefile {

  private val gf = new GeometryFactory()

  /** Parse a whole .shp file: (recordNumber, geometry) per non-null
    * record. */
  def parse(bytes: Array[Byte]): Seq[(Int, Geometry)] = {
    require(bytes.length >= 100, "shapefile shorter than its header")
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, s"bad shapefile magic ${buf.getInt(0)}")
    val out = Seq.newBuilder[(Int, Geometry)]
    var pos = 100
    var ok = true
    while (ok && pos + 8 <= bytes.length) {
      val recNo = buf.getInt(pos)
      val contentLen = buf.getInt(pos + 4) * 2
      val content = pos + 8
      if (contentLen < 4 || content + contentLen > bytes.length) ok = false
      else {
        record(buf, content).foreach(g => out += recNo -> g)
        pos = content + contentLen
      }
    }
    out.result()
  }

  private def le(buf: ByteBuffer): ByteBuffer = {
    val b = buf.duplicate(); b.order(ByteOrder.LITTLE_ENDIAN); b
  }

  private def record(buf0: ByteBuffer, at: Int): Option[Geometry] = {
    val buf = le(buf0)
    buf.getInt(at) match {
      case 0 => None // null shape
      case 1 | 11 | 21 => // Point (+Z/M: trailing measures ignored)
        Some(gf.createPoint(new Coordinate(buf.getDouble(at + 4), buf.getDouble(at + 12))))
      case 8 | 18 | 28 => // MultiPoint: box, numPoints, points
        val n = buf.getInt(at + 36)
        val pts = Array.tabulate(n)(i =>
          new Coordinate(buf.getDouble(at + 40 + 16 * i), buf.getDouble(at + 48 + 16 * i)))
        Some(gf.createMultiPointFromCoords(pts))
      case 3 | 13 | 23 => // PolyLine: box, numParts, numPoints, parts, points
        val parts = readParts(buf, at)
        val lines = parts.map(p => gf.createLineString(p))
        Some(if (lines.length == 1) lines.head
             else gf.createMultiLineString(lines.toArray))
      case 5 | 15 | 25 => // Polygon: same layout, parts are rings
        Some(assemblePolygon(readParts(buf, at)))
      case other =>
        None // unsupported type: skip the record, keep the file
    }
  }

  /** Shared PolyLine/Polygon body: numParts part offsets into a shared
    * point array; returns one coordinate array per part. */
  private def readParts(buf: ByteBuffer, at: Int): Seq[Array[Coordinate]] = {
    val numParts = buf.getInt(at + 36)
    val numPoints = buf.getInt(at + 40)
    val partIdx = Array.tabulate(numParts)(i => buf.getInt(at + 44 + 4 * i))
    val ptsAt = at + 44 + 4 * numParts
    val pts = Array.tabulate(numPoints)(i =>
      new Coordinate(buf.getDouble(ptsAt + 16 * i), buf.getDouble(ptsAt + 8 + 16 * i)))
    (0 until numParts).map { p =>
      val end = if (p + 1 < numParts) partIdx(p + 1) else numPoints
      pts.slice(partIdx(p), end)
    }
  }

  private def assemblePolygon(rings0: Seq[Array[Coordinate]]): Geometry = {
    // close unclosed rings defensively (spec requires closure)
    val rings = rings0.filter(_.length >= 3).map { cs =>
      if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    }.map(gf.createLinearRing(_))
    val (shells0, holes) = rings.partition(r => !Orientation.isCCW(r.getCoordinates))
    // nonconformant files with no CW ring: treat everything as a shell
    val (shells, realHoles) =
      if (shells0.nonEmpty) (shells0, holes) else (holes, Seq.empty[LinearRing])
    val polys = shells.map { shell =>
      val shellPoly = gf.createPolygon(shell)
      val mine = realHoles.filter(h =>
        shellPoly.contains(gf.createPoint(h.getCoordinateN(0))))
      gf.createPolygon(shell, mine.toArray)
    }
    if (polys.length == 1) polys.head else gf.createMultiPolygon(polys.toArray)
  }
}

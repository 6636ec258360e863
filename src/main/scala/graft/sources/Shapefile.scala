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

  /** Minimal dBASE III (.dbf) attribute parser — the sibling table a
    * shapefile's features are keyed by. Returns one field-name→value
    * map per record in file order (the .shp/.dbf contract is 1:1 by
    * position). Values are fixed-width ASCII, trimmed; the deletion
    * flag is ignored so positions stay aligned with .shp records.
    * Layout per the public dBASE spec: 32-byte header (record count at
    * 4 LE, header size at 8 LE, record size at 10 LE), then 32-byte
    * field descriptors (name bytes 0-10 NUL-padded, length at 16)
    * until the 0x0D terminator, then fixed-width records each starting
    * with a deletion byte. */
  def parseDbf(bytes: Array[Byte]): Seq[Map[String, String]] = {
    if (bytes.length < 32) return Seq.empty
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF
    // corrupt headers degrade to empty, like parse(): a zero record
    // size with a huge record count would otherwise fabricate rows,
    // and a header size past the file end would read out of bounds
    if (recordSize <= 0) return Seq.empty
    // field descriptors
    var at = 32
    val fields = Seq.newBuilder[(String, Int)]
    while (at + 32 <= headerSize && at + 32 <= bytes.length &&
           bytes(at) != 0x0D) {
      val nameBytes = bytes.slice(at, at + 11).takeWhile(_ != 0)
      val len = bytes(at + 16) & 0xFF
      fields += new String(nameBytes, "ASCII").trim -> len
      at += 32
    }
    val fs = fields.result()
    // a corrupt record count must not drive the scan — bound it by how
    // many fixed-width records the bytes can physically hold
    val fit = math.max(0L, (bytes.length.toLong - headerSize) / recordSize)
    val n = math.min(math.max(nRecords, 0).toLong, fit).toInt
    (0 until n).flatMap { r =>
      val base = headerSize + r * recordSize
      if (base + recordSize > bytes.length) None
      else {
        var off = base + 1 // skip deletion flag
        Some(fs.map { case (name, len) =>
          val v = new String(bytes.slice(off, off + len), "ASCII").trim
          off += len
          name -> v
        }.toMap)
      }
    }
  }

  /** Parse a whole .shp file: (recordNumber, geometry) per non-null
    * record. Corrupt input degrades, never throws: a malformed record
    * skips that record, a truncated tail stops the scan, and a file
    * too short for its header (or with the wrong magic) parses as
    * empty — one bad file must not kill a ten-thousand-file corpus
    * read (the per-file task in `SpatialIO.readShapefile`). */
  def parse(bytes: Array[Byte]): Seq[(Int, Geometry)] = {
    if (bytes.length < 100) return Seq.empty
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    if (buf.getInt(0) != 9994) return Seq.empty
    val out = Seq.newBuilder[(Int, Geometry)]
    var pos = 100
    var ok = true
    while (ok && pos + 8 <= bytes.length) {
      val recNo = buf.getInt(pos)
      val contentLen = buf.getInt(pos + 4) * 2
      val content = pos + 8
      if (contentLen < 4 || content + contentLen > bytes.length) ok = false
      else {
        // one malformed record (bad part offsets, truncated points)
        // skips that record, never the file
        try record(buf, content).foreach(g => out += recNo -> g)
        catch { case _: Exception => }
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
    // close unclosed rings defensively (spec requires closure); rings
    // that are still degenerate after closure (under 4 coordinates —
    // fewer than 3 distinct points) are skipped, not fatal
    // empty parts (degenerate/duplicate part offsets) drop here — the
    // closing step below reads cs.head, and an exception there would
    // abort the whole record instead of just the one bad ring
    val rings = rings0.filter(_.nonEmpty).map { cs =>
      if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
    }.filter(_.length >= 4).flatMap { cs =>
      try Some(gf.createLinearRing(cs)) catch { case _: Exception => None }
    }
    val (shells0, holes) = rings.partition(r => !Orientation.isCCW(r.getCoordinates))
    // nonconformant files with no CW ring: treat everything as a shell
    val (shells, realHoles) =
      if (shells0.nonEmpty) (shells0, holes) else (holes, Seq.empty[LinearRing])
    val shellPolys = shells.map(s => s -> gf.createPolygon(s))
    // a hole belongs to the SMALLEST shell covering it: with nested
    // shells every enclosing shell covers the hole, and attaching it
    // to all of them would punch the inner shell's hole through the
    // outer polygon too; covers (not contains) keeps holes whose first
    // vertex touches the shell boundary
    val holeOwner = realHoles.flatMap { h =>
      val p = gf.createPoint(h.getCoordinateN(0))
      val owners = shellPolys.filter(_._2.covers(p))
      if (owners.isEmpty) None
      else Some(owners.minBy(_._2.getArea)._1 -> h)
    }.groupBy(_._1)
    val polys = shells.map { shell =>
      gf.createPolygon(shell, holeOwner.getOrElse(shell, Nil).map(_._2).toArray)
    }
    if (polys.length == 1) polys.head else gf.createMultiPolygon(polys.toArray)
  }
}

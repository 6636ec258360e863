package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom.{Coordinate, Geometry}

/** GeoJSON-geometry JSON → WKT (reference: DS-JedAI reads GeoJSON via
  * Sedona's GeoJsonReader, `utils/readers/Reader.scala:165-168`; here
  * the geometry member is converted with Jackson + JTS — both already
  * on Spark's classpath). Returns null for malformed input so the
  * entity loader's validity filter drops the row.
  */
object GeoJsonParse {
  private val mapper = new ObjectMapper()
  private def f = Jts.factory

  private def coord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble, n.get(1).asDouble)

  private def coords(n: JsonNode): Array[Coordinate] = {
    val it = n.elements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[Coordinate]
    while (it.hasNext) buf += coord(it.next())
    buf.toArray
  }

  private def polygon(rings: JsonNode): org.locationtech.jts.geom.Polygon = {
    val shell = f.createLinearRing(coords(rings.get(0)))
    val holes = (1 until rings.size()).map(i =>
      f.createLinearRing(coords(rings.get(i)))).toArray
    f.createPolygon(shell, holes)
  }

  def build(n: JsonNode): Geometry = n.get("type").asText match {
    case "Point"      => f.createPoint(coord(n.get("coordinates")))
    case "LineString" => f.createLineString(coords(n.get("coordinates")))
    case "Polygon"    => polygon(n.get("coordinates"))
    case "MultiPoint" =>
      f.createMultiPointFromCoords(coords(n.get("coordinates")))
    case "MultiLineString" =>
      val cs = n.get("coordinates")
      f.createMultiLineString((0 until cs.size()).map(i =>
        f.createLineString(coords(cs.get(i)))).toArray)
    case "MultiPolygon" =>
      val cs = n.get("coordinates")
      f.createMultiPolygon((0 until cs.size()).map(i => polygon(cs.get(i))).toArray)
    case "GeometryCollection" =>
      val gs = n.get("geometries")
      f.createGeometryCollection((0 until gs.size()).map(i => build(gs.get(i))).toArray)
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }

  def toWkt(json: String): String = build(mapper.readTree(json)).toText
}

case class GeoJsonToWkt(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    try UTF8String.fromString(GeoJsonParse.toWkt(v.asInstanceOf[UTF8String].toString))
    catch { case _: Exception => null }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

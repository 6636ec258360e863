package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SpatialIO
import graft.operators.SpatialJoin

/** Round-trip tests for the geometry IO surface: delimited WKT,
  * N-Triples, GeoJSON readers; CSV-pairs and GeoSPARQL RDF writers.
  */
class SpatialIOSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("data").toString

  test("delimited WKT reader: parses, quotes, skips malformed rows") {
    val path = tmp("wktcsv") + ".csv"
    Files.writeString(java.nio.file.Path.of(path),
      Seq(
        """a;"POINT(1 2)";x""",
        """b;POLYGON((0 0, 4 0, 4 4, 0 4, 0 0));y""",
        """c;NOT A WKT;z""",
        """short_row""",
        """d;GEOMETRYCOLLECTION(POINT(0 0));w"""
      ).mkString("\n"))
    val df = SpatialIO.readDelimitedWkt(spark, path, idField = 0, geomField = 1,
      delimiter = ";")
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.keySet === Set("a", "b"))
    assert(rows("b") === ((0.0, 0.0, 4.0, 4.0)))
  }

  test("N-Triples reader: predicate filter + IRI/quote stripping") {
    val path = tmp("nt") + ".nt"
    Files.writeString(java.nio.file.Path.of(path),
      Seq(
        """<http://ex.org/e1> <http://strdf.di.uoa.gr/ontology#hasGeometry> "POINT(3 4)"^^<http://strdf.di.uoa.gr/ontology#WKT> .""",
        """<http://ex.org/e1> <http://ex.org/name> "not geometry" .""",
        """<http://ex.org/e2> <http://strdf.di.uoa.gr/ontology#hasGeometry> "LINESTRING(0 0, 2 2)" ."""
      ).mkString("\n"))
    val df = SpatialIO.readNTriples(spark, path)
    val ids = df.collect().map(_.getString(0)).toSet
    assert(ids === Set("http://ex.org/e1", "http://ex.org/e2"))
  }

  test("GeoJSON reader: FeatureCollection with polygon + point") {
    val path = tmp("geojson") + ".json"
    Files.writeString(java.nio.file.Path.of(path),
      """{"type":"FeatureCollection","features":[
        {"type":"Feature","properties":{"fid":"p1"},
         "geometry":{"type":"Point","coordinates":[5.0,6.0]}},
        {"type":"Feature","properties":{"fid":"p2"},
         "geometry":{"type":"Polygon","coordinates":[[[0,0],[3,0],[3,3],[0,3],[0,0]]]}}
      ]}""")
    val df = SpatialIO.readGeoJson(spark, path, "fid")
    val rows = df.collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(rows.keySet === Set("p1", "p2"))
    assert(rows("p2") === 3.0) // polygon maxx
  }

  test("RDF writer emits one GeoSPARQL triple per true relation") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val src = SpatialJoin.entities(
      Seq(("s1", "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")).toDF("id", "wkt"),
      col("id"), col("wkt"))
    val tgt = SpatialJoin.entities(
      Seq(("t1", "POINT(5 5)")).toDF("id", "wkt"),
      col("id"), col("wkt"))
    val out = tmp("rdf")
    SpatialIO.writeRdf(SpatialJoin.de9im(src, tgt), out)
    val lines = spark.read.text(out).collect().map(_.getString(0)).toSet
    assert(lines.contains("<s1> <http://www.opengis.net/ont/geosparql#sfContains> <t1> ."))
    assert(lines.contains("<s1> <http://www.opengis.net/ont/geosparql#sfIntersects> <t1> ."))
    assert(!lines.exists(_.contains("sfTouches")))
  }

  test("CSV pairs writer round-trips") {
    import spark.implicits._
    val out = tmp("pairs")
    SpatialIO.writePairsCsv(Seq(("a", "b"), ("c", "d")).toDF("s_id", "t_id"), out)
    val back = spark.read.option("header", "true").csv(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("a", "b"), ("c", "d")))
  }
}

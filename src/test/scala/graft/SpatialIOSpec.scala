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

  test("WKB parquet source: write/read round-trip preserves join results; " +
       "corrupt and collection blobs are dropped") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a mixed entity corpus via the WKT path
    val src = SpatialJoin.entities(
      TestGeoms.corpus(seed = 11, n = 30, world = 40).toDF("i", "wkt"),
      col("i"), col("wkt"))
    val tgt = SpatialJoin.entities(
      TestGeoms.corpus(seed = 12, n = 25, world = 40).toDF("i", "wkt"),
      col("i"), col("wkt"))
    val dir = tmp("wkbpq")
    SpatialIO.writeWkbParquet(src, s"$dir/src.parquet")
    val reread = SpatialIO.readWkbParquet(spark, s"$dir/src.parquet")
    // identical entity set (ids + envelopes) after the binary round-trip
    val a = src.select("id", "minx", "miny", "maxx", "maxy").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val b = reread.select("id", "minx", "miny", "maxx", "maxy").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(a === b, "entity set changed across the WKB round-trip")
    // join results identical from either source
    val viaWkt = SpatialJoin.relate(src, tgt, "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaWkb = SpatialJoin.relate(reread, tgt, "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaWkt === viaWkb)
    // validity filter: corrupt bytes, a GeometryCollection, and an
    // empty polygon must be dropped, valid rows kept
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val wkbW = new org.locationtech.jts.io.WKBWriter()
    val coll = wkbW.write(gf.createGeometryCollection(Array(
      gf.createPoint(new org.locationtech.jts.geom.Coordinate(1, 2)))))
    val emptyPoly = wkbW.write(gf.createPolygon())
    val good = wkbW.write(gf.createPoint(
      new org.locationtech.jts.geom.Coordinate(3, 4)))
    Seq(("ok", good), ("junk", Array[Byte](1, 2, 3)),
        ("coll", coll), ("empty", emptyPoly))
      .toDF("id", "wkb").write.mode("overwrite")
      .parquet(s"$dir/dirty.parquet")
    val kept = SpatialIO.readWkbParquet(spark, s"$dir/dirty.parquet")
      .select("id").as[String].collect().toSet
    assert(kept === Set("ok"), s"validity filter kept $kept")
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

  // --- shapefile fixture: serialize records per the public spec ---

  private def shpRecord(recNo: Int, content: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + content.length)
    b.order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(recNo).putInt(content.length / 2).put(content)
    b.array()
  }
  private def leBuf(n: Int): java.nio.ByteBuffer = {
    val b = java.nio.ByteBuffer.allocate(n)
    b.order(java.nio.ByteOrder.LITTLE_ENDIAN); b
  }
  private def pointContent(shapeType: Int, xy: Double*): Array[Byte] = {
    val b = leBuf(4 + 8 * xy.length)
    b.putInt(shapeType); xy.foreach(b.putDouble); b.array()
  }
  private def partsContent(shapeType: Int, parts: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val n = parts.map(_.length).sum
    val b = leBuf(44 + 4 * parts.length + 16 * n)
    b.putInt(shapeType)
    Seq(0.0, 0.0, 0.0, 0.0).foreach(b.putDouble) // box (readers recompute)
    b.putInt(parts.length).putInt(n)
    parts.scanLeft(0)(_ + _.length).init.foreach(b.putInt)
    parts.flatten.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }
  private def multiPointContent(pts: Seq[(Double, Double)]): Array[Byte] = {
    val b = leBuf(40 + 16 * pts.length)
    b.putInt(8)
    Seq(0.0, 0.0, 0.0, 0.0).foreach(b.putDouble)
    b.putInt(pts.length)
    pts.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }
  private def shpFile(records: Array[Byte]*): Array[Byte] = {
    val body = records.flatten.toArray
    val b = java.nio.ByteBuffer.allocate(100 + body.length)
    b.order(java.nio.ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)
    b.putInt(24, (100 + body.length) / 2)
    b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000)
    b.putInt(32, 5)
    b.position(100); b.put(body)
    b.array()
  }

  test("shapefile reader: points, polylines, polygons with holes, " +
       "multipoints, Z-points, null shapes") {
    // shell CW (spec), hole CCW
    val shell = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
    val file = shpFile(
      shpRecord(1, pointContent(1, 3.0, 4.0)),
      shpRecord(2, pointContent(11, 7.0, 8.0, 1.5, 2.5)), // PointZ: Z/M ignored
      shpRecord(3, partsContent(3, Seq(Seq((0.0, 0.0), (5.0, 5.0), (9.0, 2.0))))),
      shpRecord(4, partsContent(5, Seq(shell, hole))),
      shpRecord(5, multiPointContent(Seq((1.0, 1.0), (2.0, 2.0)))),
      shpRecord(6, leBuf(4).putInt(0).array()) // null shape: skipped
    )
    val dir = Files.createTempDirectory("shp")
    Files.write(dir.resolve("corpus.shp"), file)
    val got = SpatialIO.readShapefile(spark, dir.toString)
      .select("id", "geom").collect()
      .map(r => r.getString(0) -> graft.functions.Jts.fromWkb(r.getAs[Array[Byte]]("geom")))
      .toMap
    assert(got.keySet === Set(1, 2, 3, 4, 5).map(i => s"corpus.shp#$i"))
    assert(got("corpus.shp#1").toText === "POINT (3 4)")
    assert(got("corpus.shp#2").toText === "POINT (7 8)")
    assert(got("corpus.shp#3").getGeometryType === "LineString" &&
      got("corpus.shp#3").getNumPoints === 3)
    val poly = got("corpus.shp#4").asInstanceOf[org.locationtech.jts.geom.Polygon]
    assert(poly.getNumInteriorRing === 1)
    assert(poly.getArea === 100.0 - 4.0)
    assert(got("corpus.shp#5").getGeometryType === "MultiPoint")
  }

  test("shapefile polygon record with two shells becomes a MultiPolygon " +
       "with the hole attached to its containing shell") {
    val shellA = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val holeA = Seq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0))
    val shellB = Seq((20.0, 0.0), (20.0, 5.0), (25.0, 5.0), (25.0, 0.0), (20.0, 0.0))
    val parsed = graft.sources.Shapefile.parse(
      shpFile(shpRecord(1, partsContent(5, Seq(shellA, holeA, shellB)))))
    assert(parsed.length === 1)
    val mp = parsed.head._2
    assert(mp.getGeometryType === "MultiPolygon")
    assert(mp.getNumGeometries === 2)
    val areas = (0 until 2).map(mp.getGeometryN(_).getArea).sorted
    assert(areas === Seq(25.0, 100.0 - 4.0))
  }

  /** dBASE III fixture: fields (name, type, length), rows of string
    * values, fixed-width ASCII. */
  private def dbfFile(fields: Seq[(String, Char, Int)],
                      rows: Seq[Seq[String]]): Array[Byte] = {
    val recordSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + 32 * fields.length + 1
    val b = java.nio.ByteBuffer.allocate(headerSize + rows.length * recordSize + 1)
    b.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0, 0x03.toByte)
    b.putInt(4, rows.length)
    b.putShort(8, headerSize.toShort)
    b.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case ((name, tpe, len), i) =>
      val at = 32 + 32 * i
      val nb = name.getBytes("ASCII")
      (0 until math.min(10, nb.length)).foreach(j => b.put(at + j, nb(j)))
      b.put(at + 11, tpe.toByte)
      b.put(at + 16, len.toByte)
    }
    b.put(32 + 32 * fields.length, 0x0D.toByte)
    rows.zipWithIndex.foreach { case (row, r) =>
      var off = headerSize + r * recordSize
      b.put(off, ' '.toByte); off += 1
      row.zip(fields).foreach { case (v, (_, _, len)) =>
        val padded = v.padTo(len, ' ').take(len).getBytes("ASCII")
        padded.indices.foreach(j => b.put(off + j, padded(j)))
        off += len
      }
    }
    b.put(b.capacity() - 1, 0x1A.toByte)
    b.array()
  }

  test("shapefile ids come from a .dbf attribute when requested") {
    val shp = shpFile(
      shpRecord(1, pointContent(1, 1.0, 1.0)),
      shpRecord(2, pointContent(1, 2.0, 2.0)),
      shpRecord(3, pointContent(1, 3.0, 3.0)))
    val dbf = dbfFile(
      Seq(("NAME", 'C', 8), ("CODE", 'N', 4)),
      Seq(Seq("alpha", "10"), Seq("beta", "20"), Seq("gamma", "30")))
    val dir = Files.createTempDirectory("shpdbf")
    Files.write(dir.resolve("corpus.shp"), shp)
    Files.write(dir.resolve("corpus.dbf"), dbf)
    val byAttr = SpatialIO.readShapefile(spark, dir.toString, Some("NAME"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(byAttr === Set("alpha", "beta", "gamma"))
    val byCode = SpatialIO.readShapefile(spark, dir.toString, Some("CODE"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(byCode === Set("10", "20", "30"))
    // unknown attribute falls back to positional ids
    val fallback = SpatialIO.readShapefile(spark, dir.toString, Some("NOPE"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(fallback === Set(1, 2, 3).map(i => s"corpus.shp#$i"))
  }

  test("duplicate .dbf attribute values are disambiguated — the unique " +
       "entity-id contract holds no matter what the attribute holds") {
    val shp = shpFile(
      shpRecord(1, pointContent(1, 1.0, 1.0)),
      shpRecord(2, pointContent(1, 2.0, 2.0)),
      shpRecord(3, pointContent(1, 3.0, 3.0)))
    val dbf = dbfFile(
      Seq(("NAME", 'C', 8)),
      Seq(Seq("same"), Seq("same"), Seq("only")))
    val dir = Files.createTempDirectory("shpdup")
    Files.write(dir.resolve("corpus.shp"), shp)
    Files.write(dir.resolve("corpus.dbf"), dbf)
    val ids = SpatialIO.readShapefile(spark, dir.toString, Some("NAME"))
      .select("id").collect().map(_.getString(0)).toSet
    // duplicates get positional suffixes; the unique value stays bare
    assert(ids === Set("same#corpus.shp#1", "same#corpus.shp#2", "only"))
  }

  test("delimited-WKT / N-Triples / GeoJSON readers never throw on " +
       "corrupt input — bad rows drop, valid rows survive") {
    val rnd = new scala.util.Random(77)
    def garbage(n: Int): String =
      (0 until n).map(_ => (rnd.nextInt(94) + 32).toChar).mkString
    val dir = Files.createTempDirectory("fuzzsrc")
    Files.writeString(dir.resolve("bad.csv"),
      Seq("id1,POINT(1 2)", "id2", "id3,\"POLYGON((0 0, 1 0\"", garbage(60),
          "id4,POINT(3 4)", ",,,,", "\"" + garbage(20)).mkString("\n"))
    val wktIds = SpatialIO.readDelimitedWkt(
        spark, dir.resolve("bad.csv").toString, 0, 1)
      .select("id").collect().map(_.getString(0)).toSet
    assert(wktIds.contains("id1") && wktIds.contains("id4"))
    assert(!wktIds.contains("id2") && !wktIds.contains("id3"))
    Files.writeString(dir.resolve("bad.nt"),
      Seq("<a> <http://strdf.di.uoa.gr/ontology#hasGeometry> \"POINT(1 1)\" .",
          "<b> <http://strdf.di.uoa.gr/ontology#hasGeometry> \"JUNK\" .",
          garbage(40), "<c> incomplete", "").mkString("\n"))
    val ntIds = SpatialIO.readNTriples(spark, dir.resolve("bad.nt").toString)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ntIds === Set("a"))
    Files.writeString(dir.resolve("bad.json"), "{ not json " + garbage(30))
    assert(SpatialIO.readGeoJson(
      spark, dir.resolve("bad.json").toString, "name").count() === 0)
  }

  test("shapefile parser never throws on corrupt bytes — bad records " +
       "are skipped, bad files yield empty") {
    val rnd = new scala.util.Random(1234)
    // truncations and bit-flips of a valid file, plus pure noise
    val shell = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val valid = shpFile(
      shpRecord(1, pointContent(1, 3.0, 4.0)),
      shpRecord(2, partsContent(5, Seq(shell))))
    val cases: Seq[Array[Byte]] =
      (0 until 30).map(_ => valid.take(rnd.nextInt(valid.length))) ++
      (0 until 30).map { _ =>
        val b = valid.clone()
        (0 until 8).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
        b
      } ++
      (0 until 20).map(_ => Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte))
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val parsed = graft.sources.Shapefile.parse(bytes) // must not throw
      parsed.foreach { case (_, g) => assert(g != null, s"case $i") }
    }
  }

  test(".dbf parser never throws on corrupt bytes") {
    val rnd = new scala.util.Random(4321)
    val valid = dbfFile(Seq(("NAME", 'C', 8)), Seq(Seq("alpha"), Seq("beta")))
    val cases: Seq[Array[Byte]] =
      (0 until 25).map(_ => valid.take(rnd.nextInt(valid.length))) ++
      (0 until 25).map { _ =>
        val b = valid.clone()
        (0 until 6).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
        b
      } ++
      (0 until 15).map(_ => Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte))
    cases.foreach { bytes =>
      graft.sources.Shapefile.parseDbf(bytes) // must not throw
    }
  }

  test("an empty polygon part (degenerate part offsets) drops only that " +
       "ring, not the whole record") {
    // two parts sharing the same offset -> first part is empty
    val shell = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val n = shell.length
    val b = leBuf(44 + 4 * 2 + 16 * n)
    b.putInt(5)
    Seq(0.0, 0.0, 0.0, 0.0).foreach(b.putDouble)
    b.putInt(2).putInt(n)
    b.putInt(0).putInt(0) // duplicate offsets: part 0 is empty
    shell.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    val parsed = graft.sources.Shapefile.parse(
      shpFile(shpRecord(1, b.array())))
    assert(parsed.length === 1, "record must survive the degenerate part")
    assert(parsed.head._2.getArea === 100.0)
  }

  test("nested shells: hole attaches only to the smallest covering " +
       "shell; degenerate rings are skipped, not fatal") {
    // outer CW shell 20x20, inner CW shell 10x10 inside it, hole 2x2
    // inside the inner shell, plus a degenerate 2-distinct-point ring
    val outer = Seq((0.0, 0.0), (0.0, 20.0), (20.0, 20.0), (20.0, 0.0), (0.0, 0.0))
    val inner = Seq((5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0), (5.0, 5.0))
    val hole = Seq((9.0, 9.0), (11.0, 9.0), (11.0, 11.0), (9.0, 11.0), (9.0, 9.0))
    val degenerate = Seq((1.0, 1.0), (2.0, 2.0), (1.0, 1.0))
    val parsed = graft.sources.Shapefile.parse(
      shpFile(shpRecord(1, partsContent(5, Seq(outer, inner, hole, degenerate)))))
    assert(parsed.length === 1)
    val mp = parsed.head._2
    assert(mp.getNumGeometries === 2)
    val areas = (0 until 2).map(mp.getGeometryN(_)
      .asInstanceOf[org.locationtech.jts.geom.Polygon])
    // hole punched the INNER shell only; outer stays solid
    assert(areas.map(_.getArea).sorted === Seq(100.0 - 4.0, 400.0))
    assert(areas.map(_.getNumInteriorRing).sorted === Seq(0, 1))
  }

  test("shapefile polygon assembly survives nonconformant all-CCW rings") {
    val ccwRing = Seq((0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (0.0, 6.0), (0.0, 0.0))
    val parsed = graft.sources.Shapefile.parse(
      shpFile(shpRecord(1, partsContent(5, Seq(ccwRing)))))
    assert(parsed.length === 1)
    assert(parsed.head._2.getArea === 36.0)
  }
}

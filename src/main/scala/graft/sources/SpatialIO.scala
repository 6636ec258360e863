package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.functions.GeomFunctions._

/** Geometry dataset readers/writers — the reference's IO surface
  * (DS-JedAI `utils/readers/Reader.scala` S1-S6 and `utils/Utils.scala`
  * S7-S9) re-expressed on `spark.read`/`df.write`.
  *
  * All readers produce the standard entity schema of
  * [[SpatialJoin.entities]] (id, geom WKB, minx..maxy) with the
  * reference's load semantics: unparseable WKT, empty geometries and
  * GeometryCollections are dropped (`Reader.scala:59-61`). Directory
  * inputs and globs come free from Spark's file index (reference S1
  * recursed manually).
  */
object SpatialIO {

  /** Delimited WKT file (CSV/TSV, no header, positional columns) —
    * reference S2 `loadDelimitedFile` (`Reader.scala:85-112`). Rows
    * with fewer columns than needed are skipped (mode DROPMALFORMED
    * matches the reference's token-count guard, `Reader.scala:96`). */
  def readDelimitedWkt(spark: SparkSession, path: String, idField: Int,
                       geomField: Int, delimiter: String = ",",
                       dateField: Option[Int] = None,
                       datePattern: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val raw = spark.read
      .option("delimiter", delimiter)
      .option("header", "false")
      .option("mode", "DROPMALFORMED")
      .csv(path)
    val ok = raw.filter(col(s"_c$idField").isNotNull && col(s"_c$geomField").isNotNull)
    val wkt = // the reference strips optional double quotes around the WKT
      regexp_replace(col(s"_c$geomField"), "^\"|\"$", "")
    dateField match {
      case Some(d) =>
        SpatialJoin.entities(ok, col(s"_c$idField"), wkt,
          "ts" -> to_timestamp(col(s"_c$d"), datePattern))
      case None =>
        SpatialJoin.entities(ok, col(s"_c$idField"), wkt)
    }
  }

  /** RDF N-Triples with WKT literals — reference S3 `loadRdfAsTextual`
    * (`Reader.scala:120-140`): keep triples whose predicate matches,
    * strip IRI brackets and literal quotes/datatype suffix. */
  def readNTriples(spark: SparkSession, path: String,
                   geometryPredicate: String =
                     "<http://strdf.di.uoa.gr/ontology#hasGeometry>"): DataFrame = {
    val lines = spark.read.text(path)
    val parts = split(col("value"), " ", 3)
    // get() (not getItem): a malformed line with fewer than three
    // tokens must yield NULLs the predicate filter drops, not an ANSI
    // INVALID_ARRAY_INDEX error that kills the whole read
    val triple = lines.select(
      get(parts, lit(0)).as("s"),
      get(parts, lit(1)).as("p"),
      get(parts, lit(2)).as("o"))
      .filter(col("p") === geometryPredicate)
    val wkt = regexp_replace(
      regexp_replace(col("o"), "\\^\\^.*$|\\s*\\.\\s*$", ""), "^\"|\"$", "")
    val id = regexp_replace(col("s"), "^<|>$", "")
    SpatialJoin.entities(triple.select(id.as("id"), wkt.as("wkt")),
      col("id"), col("wkt"))
  }

  /** GeoJSON FeatureCollection (one feature object per line or a
    * single document) — reference S5. Uses Spark's JSON reader plus a
    * small JVM conversion of the geometry member back to WKT. */
  def readGeoJson(spark: SparkSession, path: String, idProperty: String): DataFrame = {
    import org.apache.spark.sql.types._
    // Explicit schema: `geometry` is declared StringType so the JSON
    // parser hands back the raw geometry subtree untouched — schema
    // inference would otherwise unify Point/Polygon coordinate shapes
    // into a lossy common type.
    val schema = StructType(Seq(StructField("features", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StringType)))))))
    val features = spark.read
      .option("multiLine", "true")
      .schema(schema)
      .json(path)
      .select(explode(col("features")).as("f"))
      .select(
        element_at(col("f.properties"), idProperty).as("id"),
        col("f.geometry").as("gj"))
    SpatialJoin.entities(features, col("id"), geojsonToWkt(col("gj")))
  }

  /** Minimal GeoJSON-geometry → WKT conversion via JTS (Point,
    * LineString, Polygon, Multi*). Expressed as a scalar expression. */
  private def geojsonToWkt(gj: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column => mk, expression => ex}
    mk(graft.functions.GeoJsonToWkt(ex(gj)))
  }

  /** ESRI Shapefile reader — reference S4 (upstream `Reader.scala:
    * 150-155` returns null; this is a working re-implementation from
    * the public format spec, see [[Shapefile]]). Distribution shape:
    * `binaryFile` source yields one row per .shp file, each parsed in
    * an executor task — a directory of shapefiles parallelizes
    * per-file, which matches how shapefile corpora ship (many
    * county/tile files). Attributes (.dbf) are not read; ids are
    * `<fileName>#<recordNumber>`, unique per the entity contract. */
  def readShapefile(spark: SparkSession, path: String): DataFrame =
    readShapefile(spark, path, idAttribute = None)

  /** As above, but when `idAttribute` names a .dbf column, entity ids
    * come from the sibling attribute table (matched per-file by the
    * 1:1 record-order contract) instead of `<file>#<recordNumber>`.
    * Files without a .dbf, or records without the attribute, keep the
    * positional id; DUPLICATE attribute values (within or across
    * files) are deterministically disambiguated with a positional
    * suffix — the engine-wide unique-entity-id contract (join-backs,
    * pair multiplicities) must hold no matter what the .dbf holds. */
  def readShapefile(spark: SparkSession, path: String,
                    idAttribute: Option[String]): DataFrame = {
    import spark.implicits._
    def files(glob: String) = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    def base(p: String): String = {
      val f = p.substring(p.lastIndexOf('/') + 1)
      f.substring(0, f.lastIndexOf('.'))
    }
    val geoms = files("*.shp").flatMap { case (p, bytes) =>
      Shapefile.parse(bytes).map { case (rec, g) => (base(p), rec, g.toText) }
    }.toDF("file", "rec", "wkt")
    val posId = concat(col("file"), lit(".shp#"), col("rec"))
    val rows = idAttribute match {
      case None =>
        geoms.select(posId.as("id"), col("wkt"))
      case Some(attr) =>
        val attrs = files("*.dbf").flatMap { case (p, bytes) =>
          Shapefile.parseDbf(bytes).zipWithIndex.collect {
            // .dbf rows are 0-based in file order; .shp records 1-based
            case (m, i) if m.contains(attr) => (base(p), i + 1, m(attr))
          }
        }.toDF("file", "rec", "attr_id")
          // duplicate detection over the attribute table only (never
          // the geometry rows): partitioned window, no null skew
          .withColumn("dup", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("attr_id"))) > 1)
        geoms.join(attrs, Seq("file", "rec"), "left")
          .select(
            when(col("attr_id").isNull, posId)
              .when(col("dup"), concat(col("attr_id"), lit("#"), posId))
              .otherwise(col("attr_id")).as("id"),
            col("wkt"))
    }
    SpatialJoin.entities(rows, col("id"), col("wkt"))
  }

  /** Qualifying-pair export, CSV with header — reference S7
    * `Utils.exportCSV`. */
  def writePairsCsv(pairs: DataFrame, path: String): Unit =
    pairs.write.option("header", "true").mode("overwrite").csv(path)

  /** Parquet-native spatial source: a parquet table carrying an id
    * column and a WKB binary geometry column (the columnar encoding
    * production geospatial lakes use — no text parse on the scan
    * path). Rows failing the load-time validity filter (malformed /
    * empty / GeometryCollection WKB) are dropped, matching the WKT
    * readers. */
  def readWkbParquet(spark: SparkSession, path: String,
                     idCol: String = "id", wkbCol: String = "wkb"): DataFrame =
    SpatialJoin.entitiesFromWkb(spark.read.parquet(path), col(idCol), col(wkbCol))

  /** Writer twin of [[readWkbParquet]]: dump an entity frame's id +
    * canonical WKB to parquet (the storage format for derived spatial
    * corpora; envelopes re-derive on read). */
  def writeWkbParquet(entities: DataFrame, path: String): Unit =
    entities.select(col("id"), col("geom").as("wkb"))
      .write.mode("overwrite").parquet(path)

  /** GeoSPARQL N-Triples export — reference S8 `Utils.exportRDF`: one
    * `geo:sf<Relation>` triple per true relation of each verified pair. */
  def writeRdf(de9im: DataFrame, path: String): Unit = {
    val rels = Seq("contains", "within", "covers", "coveredby", "crosses",
      "overlaps", "touches", "equals", "intersects")
    val triples = rels.map { r =>
      val name = "sf" + r.capitalize
      when(col(r), concat(lit("<"), col("s_id"),
        lit(s"> <http://www.opengis.net/ont/geosparql#$name> <"),
        col("t_id"), lit("> .")))
    }
    de9im
      .select(explode(array(triples: _*)).as("triple"))
      .filter(col("triple").isNotNull)
      .write.mode("overwrite").text(path)
  }
}

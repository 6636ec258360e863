package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate queries for the spatial engine.
  *
  * Geometries are derived deterministically from the TPC-H integer keys
  * (axis-aligned boxes from `part`/`supplier`, points from `customer`)
  * with pure integer arithmetic, then rendered to WKT and pushed through
  * the REAL pipeline: WKT parse → envelope → θ → tile join → MBR filter
  * → reference-point dedup → JTS verification. Because the inputs are
  * integer rectangles/points, every DE-9IM outcome is also expressible
  * in plain SQL comparisons — giving DuckDB oracles for the full
  * engine without any spatial extension. Arbitrary-polygon coverage
  * lives in the ScalaTest JTS differential suite.
  */
object GeoQueries {

  // --- deterministic geometry derivations (same formulas in oracle SQL) ---

  /** Boxes from part: ~2k at sf0.01 in a 1000x1000 integer space. */
  private def partBoxWkt(df: DataFrame): DataFrame = {
    val xmin = (col("p_partkey") * 13) % 980
    val ymin = (col("p_partkey") * 29) % 980
    val xmax = xmin + lit(1) + col("p_size") % 19
    val ymax = ymin + lit(1) + col("p_partkey") % 17
    df.select(col("p_partkey").as("id"),
      rectWkt(xmin, ymin, xmax, ymax).as("wkt"))
  }

  /** Boxes from supplier (smaller side — broadcast candidate). */
  private def supplierBoxWkt(df: DataFrame): DataFrame = {
    val xmin = (col("s_suppkey") * 37) % 980
    val ymin = (col("s_suppkey") * 41) % 980
    val xmax = xmin + lit(1) + col("s_suppkey") % 23
    val ymax = ymin + lit(1) + (col("s_suppkey") * 7) % 13
    df.select(col("s_suppkey").as("id"),
      rectWkt(xmin, ymin, xmax, ymax).as("wkt"))
  }

  /** Points from customer. */
  private def customerPointWkt(df: DataFrame): DataFrame =
    df.select(col("c_custkey").as("id"),
      concat(lit("POINT("), (col("c_custkey") * 17) % 1000, lit(" "),
        (col("c_custkey") * 23) % 1000, lit(")")).as("wkt"))

  private def rectWkt(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    concat(lit("POLYGON(("),
      xmin, lit(" "), ymin, lit(", "),
      xmax, lit(" "), ymin, lit(", "),
      xmax, lit(" "), ymax, lit(", "),
      xmin, lit(" "), ymax, lit(", "),
      xmin, lit(" "), ymin, lit("))"))

  /** Session-level entity memoization: a query computes θ (one job)
    * and then joins (second job) over the same entities, and the gate
    * runs many queries per session — persisting the parsed entities
    * mirrors the reference's MEMORY_AND_DISK persist of the source
    * (DS-JedAI `experiments/GiantExp.scala:77`). Entries live in
    * [[graft.spark.DfCache]]; Verify/Bench release them at end of run. */
  private def memo(s: SparkSession, dir: String, key: String)
                  (build: => DataFrame): DataFrame =
    graft.spark.DfCache.memo(s, s"$dir#$key")(build)

  private[graft] def partBoxes(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "partBoxes") {
      SpatialJoin.entities(partBoxWkt(part(s, dir)), col("id"), col("wkt"))
    }
  private[graft] def supplierBoxes(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "supplierBoxes") {
      SpatialJoin.entities(supplierBoxWkt(supplier(s, dir)), col("id"), col("wkt"))
    }

  /** Deterministic per-entity dates for the spatio-temporal join. */
  private def derivedDate(key: Column): Column =
    date_add(to_date(lit("1995-06-01")), (key % 10).cast("int"))
  private def partBoxesTemporal(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.entities(
      partBoxWkt(part(s, dir)).withColumn("ts", derivedDate(col("id"))),
      col("id"), col("wkt"), "ts" -> col("ts"))
  private def supplierBoxesTemporal(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.entities(
      supplierBoxWkt(supplier(s, dir)).withColumn("ts", derivedDate(col("id"))),
      col("id"), col("wkt"), "ts" -> col("ts"))
  private[graft] def customerPoints(s: SparkSession, dir: String): DataFrame =
    memo(s, dir, "customerPoints") {
      SpatialJoin.entities(customerPointWkt(customer(s, dir)), col("id"), col("wkt"))
    }

  // Shared oracle CTEs mirroring the derivations above.
  private[graft] val geomCtes =
    """WITH sb AS (
         SELECT p_partkey AS id,
                (p_partkey*13)%980 AS xmin, (p_partkey*29)%980 AS ymin,
                (p_partkey*13)%980 + 1 + p_size%19 AS xmax,
                (p_partkey*29)%980 + 1 + p_partkey%17 AS ymax
         FROM part),
       tb AS (
         SELECT s_suppkey AS id,
                (s_suppkey*37)%980 AS xmin, (s_suppkey*41)%980 AS ymin,
                (s_suppkey*37)%980 + 1 + s_suppkey%23 AS xmax,
                (s_suppkey*41)%980 + 1 + (s_suppkey*7)%13 AS ymax
         FROM supplier),
       pts AS (
         SELECT c_custkey AS id,
                (c_custkey*17)%1000 AS x, (c_custkey*23)%1000 AS y
         FROM customer)"""

  // --- queries ---

  /** Single-relation spatial join: part boxes containing customer
    * points (point on the boundary is NOT contained — JTS semantics). */
  def sp1PointInBox(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.relate(partBoxes(s, dir), customerPoints(s, dir), "contains")
      .orderBy(col("s_id"), col("t_id"))

  /** Single-relation spatial join: part boxes intersecting supplier
    * boxes (touching counts — inclusive). */
  def sp2BoxIntersects(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.relate(partBoxes(s, dir), supplierBoxes(s, dir), "intersects")
      .orderBy(col("s_id"), col("t_id"))

  /** Holistic interlinking relation counts — the GIA.nt headline
    * output (verifications + per-relation totals). */
  def sp3RelationCounts(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.relationCounts(partBoxes(s, dir), supplierBoxes(s, dir))

  /** Per-pair DE-9IM booleans for every verified pair. */
  def sp4De9imPairs(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.de9im(partBoxes(s, dir), supplierBoxes(s, dir))
      .select(col("s_id"), col("t_id"), col("intersects"), col("contains"),
        col("within"), col("equals"), col("touches"), col("overlaps"))
      .orderBy(col("s_id"), col("t_id"))

  /** Spatio-temporal join: intersecting boxes whose derived dates are
    * within ±2 days (the reference's SpatioTemporalEntity predicate). */
  def sp5TemporalJoin(s: SparkSession, dir: String): DataFrame =
    SpatialJoin.temporalRelate(partBoxesTemporal(s, dir),
      supplierBoxesTemporal(s, dir), "intersects", maxDays = 2)
      .orderBy(col("s_id"), col("t_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sp1_point_in_box"   -> (sp1PointInBox _),
    "sp2_box_intersects" -> (sp2BoxIntersects _),
    "sp3_relation_counts" -> (sp3RelationCounts _),
    "sp4_de9im_pairs"    -> (sp4De9imPairs _),
    "sp5_temporal_join"  -> (sp5TemporalJoin _)
  )

  // Rectangle topology in SQL:
  //  intersects (incl. touch): ranges overlap inclusively on both axes
  //  contains: closed containment (positive-area operands make the
  //            interior condition automatic)
  //  touches: inclusive intersection + at least one degenerate axis
  //  overlaps: strict interior overlap on both axes, neither contains
  private val sqlIntersects =
    "s.xmin <= t.xmax AND s.xmax >= t.xmin AND s.ymin <= t.ymax AND s.ymax >= t.ymin"
  private val sqlContains =
    "s.xmin <= t.xmin AND s.ymin <= t.ymin AND s.xmax >= t.xmax AND s.ymax >= t.ymax"
  private val sqlWithin =
    "t.xmin <= s.xmin AND t.ymin <= s.ymin AND t.xmax >= s.xmax AND t.ymax >= s.ymax"
  private val sqlEquals =
    "s.xmin = t.xmin AND s.ymin = t.ymin AND s.xmax = t.xmax AND s.ymax = t.ymax"
  private val sqlTouches =
    s"($sqlIntersects) AND (s.xmax = t.xmin OR t.xmax = s.xmin OR s.ymax = t.ymin OR t.ymax = s.ymin)"
  private val sqlStrictOverlap =
    "s.xmin < t.xmax AND s.xmax > t.xmin AND s.ymin < t.ymax AND s.ymax > t.ymin"
  private val sqlOverlaps =
    s"($sqlStrictOverlap) AND NOT ($sqlContains) AND NOT ($sqlWithin)"

  val oracles: Map[String, String] = Map(
    "sp1_point_in_box" ->
      s"""$geomCtes
         SELECT CAST(s.id AS VARCHAR) AS s_id, CAST(t.id AS VARCHAR) AS t_id
         FROM sb s, pts t
         WHERE t.x > s.xmin AND t.x < s.xmax AND t.y > s.ymin AND t.y < s.ymax
         ORDER BY 1, 2""",
    "sp2_box_intersects" ->
      s"""$geomCtes
         SELECT CAST(s.id AS VARCHAR) AS s_id, CAST(t.id AS VARCHAR) AS t_id
         FROM sb s, tb t WHERE $sqlIntersects
         ORDER BY 1, 2""",
    "sp3_relation_counts" ->
      s"""$geomCtes
         SELECT count(*) AS verifications,
           CAST(sum(CASE WHEN $sqlIntersects THEN 1 ELSE 0 END) AS BIGINT) AS intersects,
           CAST(sum(CASE WHEN $sqlContains THEN 1 ELSE 0 END) AS BIGINT) AS contains,
           CAST(sum(CASE WHEN $sqlWithin THEN 1 ELSE 0 END) AS BIGINT) AS within,
           CAST(sum(CASE WHEN $sqlContains THEN 1 ELSE 0 END) AS BIGINT) AS covers,
           CAST(sum(CASE WHEN $sqlWithin THEN 1 ELSE 0 END) AS BIGINT) AS coveredby,
           CAST(0 AS BIGINT) AS crosses,
           CAST(sum(CASE WHEN $sqlOverlaps THEN 1 ELSE 0 END) AS BIGINT) AS overlaps,
           CAST(sum(CASE WHEN $sqlTouches THEN 1 ELSE 0 END) AS BIGINT) AS touches,
           CAST(sum(CASE WHEN $sqlEquals THEN 1 ELSE 0 END) AS BIGINT) AS equals
         FROM sb s, tb t WHERE $sqlIntersects""",
    "sp5_temporal_join" ->
      s"""$geomCtes
         SELECT CAST(s.id AS VARCHAR) AS s_id, CAST(t.id AS VARCHAR) AS t_id
         FROM sb s, tb t
         WHERE $sqlIntersects
           AND abs(date_diff('day', DATE '1995-06-01' + CAST(t.id % 10 AS INT),
                             DATE '1995-06-01' + CAST(s.id % 10 AS INT))) < 2
         ORDER BY 1, 2""",
    "sp4_de9im_pairs" ->
      s"""$geomCtes
         SELECT CAST(s.id AS VARCHAR) AS s_id, CAST(t.id AS VARCHAR) AS t_id,
           ($sqlIntersects) AS intersects,
           ($sqlContains) AS contains,
           ($sqlWithin) AS within,
           ($sqlEquals) AS equals,
           ($sqlTouches) AS touches,
           ($sqlOverlaps) AS overlaps
         FROM sb s, tb t WHERE $sqlIntersects
         ORDER BY 1, 2"""
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import graft.operators.SpatialJoin

/** Differential tests of the spatial join against a brute-force JTS
  * oracle on randomly generated arbitrary geometries (polygons with
  * irregular star shapes, linestrings, points) — the pattern the
  * rectangle-based driver gate cannot cover. Fixed seed, pure JVM
  * generation (no reference-corpus data).
  */
object TestGeoms {
  private val gf = new GeometryFactory()

  /** Star-shaped polygon around a center: always simple and valid. */
  def starPolygon(rnd: scala.util.Random, cx: Double, cy: Double, rBase: Double): String = {
    val n = 5 + rnd.nextInt(8)
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n
      val r = rBase * (0.5 + rnd.nextDouble())
      new Coordinate(cx + r * math.cos(ang), cy + r * math.sin(ang))
    }
    val ring = (pts :+ pts.head).toArray
    gf.createPolygon(ring).toText
  }

  def lineString(rnd: scala.util.Random, cx: Double, cy: Double, r: Double): String = {
    val n = 3 + rnd.nextInt(5)
    var x = cx; var y = cy
    val pts = (0 until n).map { _ =>
      x += (rnd.nextDouble() - 0.5) * r; y += (rnd.nextDouble() - 0.5) * r
      new Coordinate(x, y)
    }
    gf.createLineString(pts.toArray).toText
  }

  def point(rnd: scala.util.Random, cx: Double, cy: Double): String =
    gf.createPoint(new Coordinate(cx, cy)).toText

  /** Polygon with an interior ring (hole) — boundary subtleties live
    * here. The hole is a small square guaranteed inside the star's
    * inner radius. */
  def holePolygon(rnd: scala.util.Random, cx: Double, cy: Double, rBase: Double): String = {
    val n = 6 + rnd.nextInt(6)
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n
      val r = rBase * (0.6 + 0.4 * rnd.nextDouble())
      new Coordinate(cx + r * math.cos(ang), cy + r * math.sin(ang))
    }
    val shell = gf.createLinearRing((pts :+ pts.head).toArray)
    val h = rBase * 0.2
    val hole = gf.createLinearRing(Array(
      new Coordinate(cx - h, cy - h), new Coordinate(cx - h, cy + h),
      new Coordinate(cx + h, cy + h), new Coordinate(cx + h, cy - h),
      new Coordinate(cx - h, cy - h)))
    gf.createPolygon(shell, Array(hole)).toText
  }

  /** MultiPolygon of two disjoint stars. */
  def multiPolygon(rnd: scala.util.Random, cx: Double, cy: Double, rBase: Double): String = {
    val rd = new org.locationtech.jts.io.WKTReader()
    val a = rd.read(starPolygon(rnd, cx, cy, rBase))
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    val b = rd.read(starPolygon(rnd, cx + rBase * 4, cy + rBase * 4, rBase))
      .asInstanceOf[org.locationtech.jts.geom.Polygon]
    gf.createMultiPolygon(Array(a, b)).toText
  }

  /** Mixed corpus of n geometries in a world x world space. */
  def corpus(seed: Long, n: Int, world: Double): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val cx = rnd.nextDouble() * world
      val cy = rnd.nextDouble() * world
      val wkt = rnd.nextInt(12) match {
        case 0 | 1      => point(rnd, cx, cy)
        case 2 | 3 | 4  => lineString(rnd, cx, cy, world / 20)
        case 5          => holePolygon(rnd, cx, cy, world / 22)
        case 6          => multiPolygon(rnd, cx, cy, world / 40)
        case _          => starPolygon(rnd, cx, cy, world / 25)
      }
      (s"g$i", wkt)
    }
  }
}

class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  import org.locationtech.jts.io.WKTReader

  private def entitiesDf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
  }

  private val source = TestGeoms.corpus(seed = 11, n = 90, world = 100)
  private val target = TestGeoms.corpus(seed = 23, n = 70, world = 100)

  /** Brute-force oracle: all MBR-intersecting pairs with their DE-9IM. */
  private def bruteForce(): Map[(String, String), String] = {
    val rd = new WKTReader()
    val ss = source.map { case (id, w) => (id, rd.read(w)) }
    val tt = target.map { case (id, w) => (id, rd.read(w)) }
    (for {
      (sid, sg) <- ss
      (tid, tg) <- tt
      if sg.getEnvelopeInternal.intersects(tg.getEnvelopeInternal)
    } yield (sid, tid) -> sg.relate(tg).toString).toMap
  }

  test("de9im matches brute-force JTS oracle on arbitrary geometries") {
    val got = SpatialJoin.de9im(entitiesDf(source), entitiesDf(target))
      .select("s_id", "t_id", "de9im").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val expected = bruteForce()
    assert(expected.nonEmpty, "oracle should produce candidate pairs")
    assert(got.keySet === expected.keySet,
      s"pair sets differ: missing=${(expected.keySet -- got.keySet).take(5)} " +
      s"extra=${(got.keySet -- expected.keySet).take(5)}")
    got.foreach { case (k, im) => assert(im === expected(k), s"DE-9IM differs for $k") }
  }

  test("replication produces no duplicate pairs (reference-point dedup)") {
    val pairs = SpatialJoin.de9im(entitiesDf(source), entitiesDf(target))
      .groupBy("s_id", "t_id").count().filter(col("count") > 1).count()
    assert(pairs === 0)
  }

  test("single-relation join equals the relation's oracle subset") {
    val rd = new WKTReader()
    val expected = (for {
      (sid, sg) <- source.map { case (id, w) => (id, rd.read(w)) }
      (tid, tg) <- target.map { case (id, w) => (id, rd.read(w)) }
      if sg.intersects(tg)
    } yield (sid, tid)).toSet
    val got = SpatialJoin.relate(entitiesDf(source), entitiesDf(target), "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)
  }

  test("tile-bloom-pruned candidates equal the plain path pair-for-pair, " +
       "and the bloom measurably cuts the target's exchange input") {
    val s = entitiesDf(source)
    val t = entitiesDf(target)
    val theta = SpatialJoin.computeTheta(s)
    val plain = SpatialJoin.candidatePairsNarrow(s, t, theta)
      .select("s_id", "t_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val pruned = SpatialJoin.candidatePairsNarrowPruned(s, t, theta)
    // collect() so metrics land on THIS dataset's queryExecution
    val prunedPairs = pruned.select("s_id", "t_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(prunedPairs === plain,
      "bloom pruning must not change the candidate pair set")
    // the relate form over the pruned path agrees with plain relate
    val gotRelate = SpatialJoin
      .relateBloomPruned(s, t, "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val plainRelate = SpatialJoin.relate(s, t, "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotRelate === plainRelate)
    // SQL-metric assertion (the q20 pattern): the FilterExec holding
    // the bloom predicate must pass strictly fewer rows than the
    // target side's exploded tile count — i.e. the exchange input was
    // actually cut, not just wrapped
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(walk)
    }
    val metricsDf = SpatialJoin.candidatePairsNarrowPruned(s, t, theta)
    metricsDf.collect()
    val bloomFilters = walk(metricsDf.queryExecution.executedPlan).collect {
      case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no bloom FilterExec in the executed plan")
    // InferFiltersFromConstraints may propagate the tile predicate to
    // the SOURCE side through the equi-join key (harmless — prunes
    // nothing there); the assertion targets the TARGET-side filter
    val targetSide = bloomFilters.filter(_.output.exists(_.name == "t_id"))
    assert(targetSide.nonEmpty, "no bloom FilterExec on the target side")
    val survived = targetSide.map(_.metrics("numOutputRows").value).max
    val tExplodedTiles = t.select(
      explode(graft.functions.GeomFunctions.tile_cover(
        col("minx"), col("miny"), col("maxx"), col("maxy"),
        theta.x, theta.y))).count()
    assert(survived < tExplodedTiles,
      s"bloom passed $survived of $tExplodedTiles exploded target tiles " +
        "— no exchange cut")
  }

  test("typed cogroup+index path equals the declarative tile join") {
    val declarative = SpatialJoin.de9im(entitiesDf(source), entitiesDf(target))
      .select("s_id", "t_id", "de9im").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val typed = graft.operators.TypedGiant.de9im(entitiesDf(source), entitiesDf(target))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(typed === declarative)
  }

  test("negative-coordinate world: declarative, typed and brute force " +
       "all agree") {
    // centered at the origin: tile indices and coarse keys are negative
    // — floor vs truncation bugs live here
    val gf2 = new GeometryFactory()
    val rnd = new scala.util.Random(123)
    def shifted(seed: Long, n: Int) = TestGeoms.corpus(seed, n, 80).map {
      case (id, wkt) =>
        val g = new WKTReader().read(wkt)
        val t = org.locationtech.jts.geom.util.AffineTransformation
          .translationInstance(-40, -40)
        (id, t.transform(g).toText)
    }
    val src = shifted(201, 70)
    val tgt = shifted(202, 60)
    val rd = new WKTReader()
    val expected = (for {
      (sid, sw) <- src; (tid, tw) <- tgt
      sg = rd.read(sw); tg = rd.read(tw)
      if sg.getEnvelopeInternal.intersects(tg.getEnvelopeInternal)
    } yield (sid, tid) -> sg.relate(tg).toString).toMap
    val decl = SpatialJoin.de9im(entitiesDf(src), entitiesDf(tgt))
      .select("s_id", "t_id", "de9im").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val typed = graft.operators.TypedGiant.de9im(entitiesDf(src), entitiesDf(tgt))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(decl === expected)
    assert(typed === expected)
  }

  test("entities drops invalid WKT, empty and GeometryCollection rows") {
    import spark.implicits._
    val rows = Seq(
      ("ok",  "POINT(1 2)"),
      ("bad", "POLYGON((borked"),
      ("gc",  "GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0, 1 1))"),
      ("bow", "POLYGON((0 0, 2 2, 2 0, 0 2, 0 0))"), // self-intersecting
      ("emp", "POLYGON EMPTY"))
    val kept = SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
      .select("id").collect().map(_.getString(0)).toSet
    assert(kept === Set("ok"))
  }

  test("theta falls back for zero-extent (point-only) sources") {
    val pts = (0 until 10).map(i => (s"p$i", s"POINT($i $i)"))
    val th = SpatialJoin.computeTheta(entitiesDf(pts))
    assert(th.x === 1.0 && th.y === 1.0)
    // EVERY statistic must keep the fallback: max(extent) over a
    // point-only axis is 0.0 (not NULL) — unguarded it would clamp to
    // the 1e-9 floor and explode each MBR into ~extent/1e-9 tiles
    for (g <- Seq("avg", "avg2", "min", "max")) {
      val t = SpatialJoin.computeTheta(entitiesDf(pts), g)
      assert(t.x === 1.0 && t.y === 1.0, s"granularity $g: $t")
    }
  }

  test("computeTheta granularity statistics match the reference's " +
       "TileGranularities semantics (min filters zero extents)") {
    // two boxes (extents 2×4 and 6×8) and one point (zero extent)
    val rows = Seq(
      ("a", "POLYGON((0 0, 2 0, 2 4, 0 4, 0 0))"),
      ("b", "POLYGON((10 10, 16 10, 16 18, 10 18, 10 10))"),
      ("p", "POINT(5 5)"))
    val df = entitiesDf(rows)
    val avg = SpatialJoin.computeTheta(df, "avg")
    assert(avg.x === 4.0 && avg.y === 6.0) // mean of non-degenerate
    val avg2 = SpatialJoin.computeTheta(df, "avg2")
    assert(avg2.x === 2.0 && avg2.y === 3.0)
    val mn = SpatialJoin.computeTheta(df, "min")
    assert(mn.x === 2.0 && mn.y === 4.0) // zero extents filtered
    val mx = SpatialJoin.computeTheta(df, "max")
    assert(mx.x === 6.0 && mx.y === 8.0)
    val none = SpatialJoin.computeTheta(df, "none")
    assert(none.x === 1.0 && none.y === 1.0)
    intercept[IllegalArgumentException] {
      SpatialJoin.computeTheta(df, "median")
    }
    // default overload unchanged
    assert(SpatialJoin.computeTheta(df) === avg)
  }

  test("overlayArea matches brute-force JTS set-intersection areas on " +
       "arbitrary geometries") {
    val rd = new WKTReader()
    val ss = source.map { case (id, w) => (id, rd.read(w)) }
    val tt = target.map { case (id, w) => (id, rd.read(w)) }
    val expected = (for {
      (_, sg) <- ss
      (tid, tg) <- tt
      if sg.intersects(tg)
    } yield tid -> sg.intersection(tg).getArea)
      .groupBy(_._1)
      .map { case (tid, xs) => tid -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val got = SpatialJoin
      .overlayArea(entitiesDf(source), entitiesDf(target))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (tid, (n, a)) =>
      assert(n === expected(tid)._1, s"pair count differs for $tid")
      assert(math.abs(a - expected(tid)._2) <=
        1e-9 * math.max(1.0, expected(tid)._2.abs),
        s"area differs for $tid: $a vs ${expected(tid)._2}")
    }
    assert(got.nonEmpty)
  }

  test("countVerifications equals the MBR-intersecting pair count and " +
       "plans no geometry join-backs") {
    val expected = bruteForce().size.toLong
    assert(SpatialJoin.countVerifications(entitiesDf(source), entitiesDf(target))
      === expected)
    // the count path must stay narrow: no WKB blobs in the plan
    val theta = SpatialJoin.computeTheta(entitiesDf(source))
    val plan = SpatialJoin
      .candidatePairsNarrow(entitiesDf(source), entitiesDf(target), theta)
      .queryExecution.optimizedPlan
    assert(!plan.output.map(_.name).contains("s_geom"))
    assert(!plan.toString.contains("s_geom"))
  }

  test("sp20 tile density equals a driver-side floor-range recompute " +
       "over the collected boxes (incl. the packed-id decode)") {
    val dir = "/root/testdata/sf0.001"
    val boxes = graft.operators.GeoQueries.partBoxes(spark, dir)
      .select(col("minx"), col("miny"), col("maxx"), col("maxy"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val expect = boxes.flatMap { case (x0, y0, x1, y1) =>
      for {
        tx <- math.floor(x0 / 10).toLong to math.floor(x1 / 10).toLong
        ty <- math.floor(y0 / 10).toLong to math.floor(y1 / 10).toLong
      } yield (tx, ty)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = graft.operators.GeoQueries.sp20TileDensity(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    // no-dedup check, independent of `expect`: total tile rows equal
    // the closed-form per-box cover sizes (nx * ny per box)
    val coverSizes = boxes.map { case (x0, y0, x1, y1) =>
      (math.floor(x1 / 10).toLong - math.floor(x0 / 10).toLong + 1) *
        (math.floor(y1 / 10).toLong - math.floor(y0 / 10).toLong + 1)
    }.sum
    assert(got.values.sum === coverSizes)
  }
}

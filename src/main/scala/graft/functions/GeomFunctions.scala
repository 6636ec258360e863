package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.{Geometry, GeometryFactory, GeometryCollection, Polygon, Point, LineString, MultiPolygon, MultiPoint, MultiLineString}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader}

/** JTS plumbing shared by the geometry expressions.
  *
  * JTS readers/writers are not thread-safe; Spark evaluates expressions
  * on many task threads inside one executor JVM, so each thread gets its
  * own instances. (Reference behavior being re-expressed: per-partition
  * WKTReader in DS-JedAI `utils/readers/Reader.scala:85-112`.)
  */
object Jts {
  val factory = new GeometryFactory()
  private val wktR = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wkbR = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbW = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())
  def parseWkt(s: String): Geometry = wktR.get().read(s)
  def fromWkb(b: Array[Byte]): Geometry = wkbR.get().read(b)
  def toWkb(g: Geometry): Array[Byte] = wkbW.get().write(g)

  /** Encode a tile coordinate pair into one long (cheap shuffle key). */
  @inline def encodeTile(tx: Long, ty: Long): Long = (tx << 32) | (ty & 0xFFFFFFFFL)
}

/** Per-thread LRU caches for verification: WKB → parsed Geometry and
  * WKB → PreparedGeometry. After the tile join, a hot build-side
  * geometry participates in many pairs within a partition; caching by
  * WKB content (ByteBuffer keys hash by content) removes the repeated
  * parse and lets JTS prepared predicates reuse their internal index —
  * the declarative-path equivalent of the reference's per-partition
  * prepared entities (`model/entities/PreparedEntity.scala`).
  */
object GeomCache {
  import java.nio.ByteBuffer
  import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
  private val MAX = 8192
  private final class Lru[K, V](max: Int)
      extends java.util.LinkedHashMap[K, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean = size() > max
  }
  private val geoms = ThreadLocal.withInitial[Lru[ByteBuffer, Geometry]](
    () => new Lru(MAX))
  private val preps = ThreadLocal.withInitial[Lru[ByteBuffer, PreparedGeometry]](
    () => new Lru(MAX))
  def geometry(wkb: Array[Byte]): Geometry = {
    val k = ByteBuffer.wrap(wkb)
    val c = geoms.get()
    var g = c.get(k)
    if (g == null) { g = Jts.fromWkb(wkb); c.put(k, g) }
    g
  }
  private val segs = ThreadLocal.withInitial[Lru[(ByteBuffer, Double, Double), Seq[(Long, Long, Geometry)]]](
    () => new Lru(256)) // segments are bulky; smaller budget
  def segments(wkb: Array[Byte], thetaX: Double, thetaY: Double): Seq[(Long, Long, Geometry)] = {
    val k = (ByteBuffer.wrap(wkb), thetaX, thetaY)
    val c = segs.get()
    var s = c.get(k)
    if (s == null) {
      s = graft.geometry.Decompose.gridSegments(geometry(wkb), thetaX, thetaY)
      c.put(k, s)
    }
    s
  }
  def prepared(wkb: Array[Byte]): PreparedGeometry = {
    val k = ByteBuffer.wrap(wkb)
    val c = preps.get()
    var p = c.get(k)
    if (p == null) { p = PreparedGeometryFactory.prepare(geometry(wkb)); c.put(k, p) }
    p
  }
}

/** Parse WKT to WKB bytes. Returns null (→ row filterable) for
  * unparseable, empty, or GeometryCollection input — matching the
  * reference's load-time validity filter (DS-JedAI
  * `utils/readers/Reader.scala:59-61`: invalid/empty/collection rows
  * are dropped before linking).
  */
case class StGeomFromWkt(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    try {
      val g = Jts.parseWkt(v.asInstanceOf[UTF8String].toString)
      if (g == null || g.isEmpty || g.getClass == classOf[GeometryCollection] || !g.isValid) null
      else Jts.toWkb(g)
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Validate/normalize WKB bytes (the parquet-native geometry
  * encoding): parse, apply the SAME load-time validity filter as
  * [[StGeomFromWkt]] (null for unparseable / empty /
  * GeometryCollection / invalid), and re-emit canonical WKB — so
  * downstream expressions never meet a malformed blob and byte-level
  * encoding variants (endianness, 2.5D flags) normalize to the
  * engine's canonical form. */
case class StGeomFromWkb(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    try {
      val g = Jts.fromWkb(v.asInstanceOf[Array[Byte]])
      if (g == null || g.isEmpty || g.getClass == classOf[GeometryCollection] || !g.isValid) null
      else Jts.toWkb(g)
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Envelope of a WKB geometry as struct<minx,miny,maxx,maxy>. */
case class StEnvelope(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StEnvelope.schema
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val env = Jts.fromWkb(v.asInstanceOf[Array[Byte]]).getEnvelopeInternal
    new GenericInternalRow(Array[Any](env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
object StEnvelope {
  val schema: StructType = StructType(Seq(
    StructField("minx", DoubleType, nullable = false),
    StructField("miny", DoubleType, nullable = false),
    StructField("maxx", DoubleType, nullable = false),
    StructField("maxy", DoubleType, nullable = false)))
}

/** Number of coordinates (verification-cost proxy; DS-JedAI weights
  * use it as ISP, `model/weightedPairs/WeightedPairFactory.scala:112`). */
case class StNumPoints(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    Jts.fromWkb(v.asInstanceOf[Array[Byte]]).getNumPoints
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class StArea(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Jts.fromWkb(v.asInstanceOf[Array[Byte]]).getArea
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Area of the JTS set-theoretic intersection — the overlay MEASURE
  * step (how much do they overlap) the boolean DE-9IM family cannot
  * express. General polygon/line/point operands: lower-dimensional
  * intersections (touch line/point) have area 0. On integer-coordinate
  * operands the shoelace sum is exact double arithmetic (products and
  * partial sums stay far below 2^53), which is what lets the sp19 gate
  * hash-check this path against a closed-form SQL oracle. */
case class StIntersectionArea(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = GeomCache.geometry(l.asInstanceOf[Array[Byte]])
    val b = GeomCache.geometry(r.asInstanceOf[Array[Byte]])
    a.intersection(b).getArea
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Full DE-9IM verification: one JTS `relate` per pair, all ten
  * topological booleans extracted from the single IntersectionMatrix
  * (mirrors DS-JedAI `model/IM.scala:6-39`). Emitting them all at once
  * means downstream relation-count aggregation is plain sum(when(..)).
  */
case class StIm(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StIm.schema
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val g1 = GeomCache.geometry(l.asInstanceOf[Array[Byte]])
    val g2 = GeomCache.geometry(r.asInstanceOf[Array[Byte]])
    // rectangle-rectangle pairs take the analytic interval-arithmetic
    // path (~ns) instead of JTS topology-graph relate (~100s of µs)
    val im = if (g1.isRectangle && g2.isRectangle) {
      val e1 = g1.getEnvelopeInternal; val e2 = g2.getEnvelopeInternal
      new org.locationtech.jts.geom.IntersectionMatrix(
        graft.geometry.RectIM.matrix(
          e1.getMinX, e1.getMinY, e1.getMaxX, e1.getMaxY,
          e2.getMinX, e2.getMinY, e2.getMaxX, e2.getMaxY))
    } else g1.relate(g2)
    val d1 = g1.getDimension; val d2 = g2.getDimension
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(im.toString),
      !im.isDisjoint,
      im.isContains,
      im.isWithin,
      im.isCovers,
      im.isCoveredBy,
      im.isCrosses(d1, d2),
      im.isOverlaps(d1, d2),
      im.isTouches(d1, d2),
      im.isEquals(d1, d2)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}
object StIm {
  // nullable: StImAdaptive's early-exit branch emits NULL for every
  // column except `intersects` (partial accumulation — see there); the
  // exact paths never produce nulls
  val schema: StructType = StructType(Seq(
    StructField("de9im", StringType, nullable = true),
    StructField("intersects", BooleanType, nullable = false),
    StructField("contains", BooleanType, nullable = true),
    StructField("within", BooleanType, nullable = true),
    StructField("covers", BooleanType, nullable = true),
    StructField("coveredby", BooleanType, nullable = true),
    StructField("crosses", BooleanType, nullable = true),
    StructField("overlaps", BooleanType, nullable = true),
    StructField("touches", BooleanType, nullable = true),
    StructField("equals", BooleanType, nullable = true)))
}

/** Adaptive DE-9IM verification: rectangles → analytic interval IM;
  * large polygon pairs → exact segmented IM over cached θ-grid
  * segments (cost bounded by the interaction neighbourhood); everything
  * else → plain JTS relate. children: wkb1, wkb2, θx, θy, minPoints,
  * earlyExit (literals). With earlyExit=true the segmented branch uses
  * the reference's RANK-ordered early-exit accumulation
  * ([[graft.geometry.SegmentedIM.imEarlyExit]]) — only the intersects
  * decision is contractual there, so it stays default-off AND every
  * other output column is emitted as NULL on that branch (never a
  * silently under-set false). Output schema identical to [[StIm]].
  */
case class StImAdaptive(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StIm.schema
  override def nullable: Boolean = children.take(2).exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val l = children(0).eval(input); val r = children(1).eval(input)
    if (l == null || r == null) return null
    val thetaX = children(2).eval(input).asInstanceOf[Double]
    val thetaY = children(3).eval(input).asInstanceOf[Double]
    val minPts = children(4).eval(input).asInstanceOf[Int]
    val earlyExit =
      children.length > 5 && children(5).eval(input).asInstanceOf[Boolean]
    val wkb1 = l.asInstanceOf[Array[Byte]]; val wkb2 = r.asInstanceOf[Array[Byte]]
    val g1 = GeomCache.geometry(wkb1); val g2 = GeomCache.geometry(wkb2)
    var partialIm = false // early-exit branch: only `intersects` is contractual
    val im =
      if (g1.isRectangle && g2.isRectangle) {
        val e1 = g1.getEnvelopeInternal; val e2 = g2.getEnvelopeInternal
        new org.locationtech.jts.geom.IntersectionMatrix(
          graft.geometry.RectIM.matrix(
            e1.getMinX, e1.getMinY, e1.getMaxX, e1.getMaxY,
            e2.getMinX, e2.getMinY, e2.getMaxX, e2.getMaxY))
      } else if (g1.getDimension == 2 && g2.getDimension == 2 &&
                 g1.getNumPoints + g2.getNumPoints >= minPts) {
        if (earlyExit) {
          partialIm = true
          graft.geometry.SegmentedIM.imEarlyExit(g1, g2,
            GeomCache.segments(wkb1, thetaX, thetaY),
            GeomCache.segments(wkb2, thetaX, thetaY))
        } else
          graft.geometry.SegmentedIM.im(g1, g2,
            GeomCache.segments(wkb1, thetaX, thetaY),
            GeomCache.segments(wkb2, thetaX, thetaY))
      } else g1.relate(g2)
    val d1 = g1.getDimension; val d2 = g2.getDimension
    if (partialIm)
      // The accumulation stopped at the intersects decision, so every
      // other entry may be under-set; emit NULL there rather than a
      // silently wrong false (a disjoint result is complete: the
      // canonical FF2FF1212 came back and nulls stay correct-by-vacuity)
      new GenericInternalRow(Array[Any](
        null, !im.isDisjoint, null, null, null, null, null, null, null, null))
    else
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(im.toString),
        !im.isDisjoint,
        im.isContains, im.isWithin, im.isCovers, im.isCoveredBy,
        im.isCrosses(d1, d2), im.isOverlaps(d1, d2), im.isTouches(d1, d2),
        im.isEquals(d1, d2)))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}

/** Single-relation verification (DS-JedAI `linkers/GIAnt.scala:19-25`).
  * `relation` is bound at plan time so the JTS dispatch is a stable
  * branch, not per-row string matching.
  */
case class StPredicate(left: Expression, right: Expression, relation: String)
    extends BinaryExpression with CodegenFallback {
  import graft.model.Relation
  private val rel = Relation.of(relation)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val p1 = GeomCache.prepared(l.asInstanceOf[Array[Byte]])
    val g2 = GeomCache.geometry(r.asInstanceOf[Array[Byte]])
    rel.evalPrepared(p1, g2)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r, relation)
}

/** Tile ids (encoded long) covered by an MBR on the θ grid.
  * children: minx, miny, maxx, maxy (+ literal θx, θy).
  * Tile index of a coordinate is floor(c/θ) — the refinement filter in
  * the join recomputes the same floor on the reference point, making
  * replicated pairs emit exactly once (DS-JedAI
  * `linkers/LinkerT.scala:30-41`).
  */
case class TileCover(children: Seq[Expression]) extends Expression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(minx, miny, maxx, maxy, tx, ty) = vs.map(_.asInstanceOf[Double])
    TileCover.compute(minx, miny, maxx, maxy, tx, ty)
  }
  // Codegen as a static call: tile_cover sits under the explode of
  // EVERY tile join — the CodegenFallback boxed-row path would break
  // the hot scan stage's whole-stage codegen.
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val evalChildren = gens.map(_.code).reduce(_ + _)
    val nullCheck =
      if (nullable) gens.map(g => s"${g.isNull}").mkString(" || ") else "false"
    val args = gens.map(g => s"${g.value}").mkString(", ")
    ev.copy(code = code"""
      $evalChildren
      boolean ${ev.isNull} = $nullCheck;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.TileCover.compute($args);
      }""")
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}
object TileCover {
  /** Per-geometry θ-tile cap — past this the tile join's replication
    * factor is the bottleneck, not a tractable plan. */
  val MaxTiles: Long = 4L * 1000 * 1000

  /** Shared loop for interpreted and generated code. */
  def compute(minx: Double, miny: Double, maxx: Double, maxy: Double,
              tx: Double, ty: Double): GenericArrayData = {
    val x0 = math.floor(minx / tx).toLong; val x1 = math.floor(maxx / tx).toLong
    val y0 = math.floor(miny / ty).toLong; val y1 = math.floor(maxy / ty).toLong
    // Guard the Long product BEFORE the Int cast: a geometry spanning a
    // huge number of θ-tiles (tiny θ, bad coordinates, or one
    // continent-sized MBR) would otherwise overflow into a negative
    // array size or silently explode the row count by millions.
    val nL = (x1 - x0 + 1) * (y1 - y0 + 1)
    if (nL > MaxTiles)
      throw new IllegalArgumentException(
        s"tile_cover: MBR [$minx,$miny,$maxx,$maxy] spans $nL θ-tiles " +
        s"(cap $MaxTiles). Use a coarser θ (AVG tiling over a " +
        "source with comparable extents) or pre-split the geometry.")
    val n = nL.toInt
    val out = new Array[Long](n)
    var i = 0; var x = x0
    while (x <= x1) { var y = y0; while (y <= y1) { out(i) = Jts.encodeTile(x, y); i += 1; y += 1 }; x += 1 }
    new GenericArrayData(out)
  }
}

/** Fine-grained envelopes (DS-JedAI FineGrainedEnvelopes
  * approximation, `model/approximations/FineGrainedEnvelopes.scala`):
  * per θ-slab envelopes of the geometry, a tighter candidate filter
  * than the single MBR. children: wkb, θx (lit), maxEnvs (lit). */
case class StFineEnvelopes(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = ArrayType(StEnvelope.schema, containsNull = false)
  override def nullable: Boolean = children.head.nullable
  override def eval(input: InternalRow): Any = {
    val wkb = children(0).eval(input)
    if (wkb == null) return null
    val thetaX = children(1).eval(input).asInstanceOf[Double]
    val maxEnvs = children(2).eval(input).asInstanceOf[Int]
    val g = Jts.fromWkb(wkb.asInstanceOf[Array[Byte]])
    val envs = graft.geometry.Decompose.refinedEnvelopes(g, thetaX, maxEnvs)
    new GenericArrayData(envs.map(e => new GenericInternalRow(
      Array[Any](e.getMinX, e.getMinY, e.getMaxX, e.getMaxY))).toArray[Any])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}

/** θ-grid decomposition (DS-JedAI GridDecomposer semantics): the
  * geometry split along grid lines into per-tile segments.
  * children: wkb, θx (lit), θy (lit). Output rows: (tile, seg wkb). */
case class StGridSegments(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tile", LongType, nullable = false),
    StructField("seg", BinaryType, nullable = false))), containsNull = false)
  override def nullable: Boolean = children.head.nullable
  override def eval(input: InternalRow): Any = {
    val wkb = children(0).eval(input)
    if (wkb == null) return null
    val tx = children(1).eval(input).asInstanceOf[Double]
    val ty = children(2).eval(input).asInstanceOf[Double]
    val g = Jts.fromWkb(wkb.asInstanceOf[Array[Byte]])
    val segs = graft.geometry.Decompose.gridSegments(g, tx, ty)
    new GenericArrayData(segs.map { case (x, y, seg) =>
      new GenericInternalRow(Array[Any](Jts.encodeTile(x, y), Jts.toWkb(seg)))
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(cs)
}

/** Coordinate precision reduction (DS-JedAI D6,
  * `utils/geometryUtils/GeometryUtils.scala:18-24`): snap coordinates
  * to a fixed decimal grid via JTS's precision reducer — the loader
  * step that makes noisy real-world coordinates hashable/joinable.
  * children: wkb, scale (literal; 1e11 mirrors the reference). */
case class StReducePrecision(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable
  override def nullSafeEval(wkb: Any, scale: Any): Any = {
    val g = Jts.fromWkb(wkb.asInstanceOf[Array[Byte]])
    val pm = new org.locationtech.jts.geom.PrecisionModel(scale.asInstanceOf[Double])
    val reduced = org.locationtech.jts.precision.GeometryPrecisionReducer.reduce(g, pm)
    if (reduced.isEmpty) null else Jts.toWkb(reduced)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Optimizer barrier: a semantic no-op marked non-deterministic so
  * Catalyst neither collapses the projection that computes `child` nor
  * pushes filters through it. Used around the WKT parse in the entity
  * loader — without it, inferred not-null constraints from downstream
  * joins get pushed into the scan filter and inline the full parse
  * expression once per referenced column (~9 redundant parses/row).
  *
  * Codegen PASSES THROUGH to the child (round 15; the built-in
  * TaggingExpression pattern): the barrier's job is optimizer-level
  * only, but its former CodegenFallback forced the ENTIRE wrapped
  * subtree into interpreted per-row eval — ta7's shingle pipeline
  * measured 26x slower that way (17 s vs 0.65 s at sf0.1 after the
  * leaf-only workaround), and the dd3/dd5/dd18 jaccard verifies, the
  * ta15 k-gram build and every barrier'd token split were paying the
  * same hidden tax. Wrapped subtrees that are themselves
  * CodegenFallback (JTS geometry exprs, higher-order functions)
  * generate their own fallback call exactly as before.
  */
case class ExprBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    if (ExprBarrier.codegen) child.genCode(ctx)
    // interpreted escape hatch (A/B measurements): the pre-round-15
    // CodegenFallback behavior via a fallback twin
    else ExprBarrierInterp(child).genCode(ctx)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Interpreted twin of [[ExprBarrier]] — only instantiated inside the
  * generated code path when `GRAFT_BARRIER_CODEGEN=0`. */
case class ExprBarrierInterp(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object ExprBarrier {
  /** `GRAFT_BARRIER_CODEGEN=0` restores the interpreted barrier for
    * A/B measurements. */
  val codegen: Boolean =
    sys.env.getOrElse("GRAFT_BARRIER_CODEGEN", "1") != "0"
}

/** Column-API wrappers. */
object GeomFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => mk, expression => ex}
  def st_geomfromwkt(wkt: Column): Column = mk(StGeomFromWkt(ex(wkt)))
  def st_geomfromwkb(wkb: Column): Column = mk(StGeomFromWkb(ex(wkb)))
  def barrier(c: Column): Column = mk(ExprBarrier(ex(c)))
  def st_envelope(geom: Column): Column = mk(StEnvelope(ex(geom)))
  def st_numpoints(geom: Column): Column = mk(StNumPoints(ex(geom)))
  def st_area(geom: Column): Column = mk(StArea(ex(geom)))
  def st_intersection_area(l: Column, r: Column): Column =
    mk(StIntersectionArea(ex(l), ex(r)))
  def st_im(l: Column, r: Column): Column = mk(StIm(ex(l), ex(r)))
  def st_im_adaptive(l: Column, r: Column, thetaX: Double, thetaY: Double,
                     minPoints: Int = 64, earlyExit: Boolean = false): Column =
    mk(StImAdaptive(Seq(ex(l), ex(r),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaX),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaY),
      org.apache.spark.sql.catalyst.expressions.Literal(minPoints),
      org.apache.spark.sql.catalyst.expressions.Literal(earlyExit))))
  def st_predicate(l: Column, r: Column, relation: String): Column =
    mk(StPredicate(ex(l), ex(r), relation))
  def tile_cover(minx: Column, miny: Column, maxx: Column, maxy: Column,
                 thetaX: Double, thetaY: Double): Column =
    mk(TileCover(Seq(ex(minx), ex(miny), ex(maxx), ex(maxy),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaX),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaY))))
  def st_reduce_precision(geom: Column, scale: Double): Column =
    mk(StReducePrecision(ex(geom),
      org.apache.spark.sql.catalyst.expressions.Literal(scale)))
  def st_fine_envelopes(geom: Column, thetaX: Double, maxEnvs: Int): Column =
    mk(StFineEnvelopes(Seq(ex(geom),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaX),
      org.apache.spark.sql.catalyst.expressions.Literal(maxEnvs))))
  def st_grid_segments(geom: Column, thetaX: Double, thetaY: Double): Column =
    mk(StGridSegments(Seq(ex(geom),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaX),
      org.apache.spark.sql.catalyst.expressions.Literal(thetaY))))
}

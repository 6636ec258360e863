package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

/** Synthetic corpus scaling — S10, the reference's jitter generator
  * (`experiments/GeometryTransformer.scala:43-91`): produce `times`
  * perturbed copies of an entity corpus, each coordinate shifted by a
  * random amount in [0.5, 1.5) via one of three modes (translate +,
  * translate −, scale ×), so a small benchmark dataset grows into a
  * larger one with the same shape statistics.
  *
  * Differences from the reference, both deliberate:
  *  - DETERMINISTIC: the reference seeds from wall-clock time; here the
  *    per-row RNG is seeded from (seed, copy, entity id), so the same
  *    inputs always produce the same corpus — reproducible benchmarks,
  *    and no shared RNG bottleneck across executor threads.
  *  - Distributed as a typed map over the entity frame (one row per
  *    (entity, copy)), not a driver-side loop of saveAsTextFile jobs;
  *    writing is the caller's choice of sink.
  */
object Jitter {

  private val gf = new GeometryFactory()

  /** One perturbed copy of `g` — reference `geometryTransformation`
    * semantics (shift in [0.5, 1.5), mode drawn per coordinate from
    * {translate+, translate−, scale}). Extension over upstream (which
    * passes multi-geometries and collections through unchanged):
    * collection members are transformed individually, so Multi*
    * corpora scale too.
    *
    * `translateOnly = true` drops the ×-scale arm (same RNG draws, so
    * seeds stay comparable): on corpora far from the origin that arm
    * moves a vertex by up to 50% of its ABSOLUTE coordinate, which
    * inflates envelopes and changes pair density — the scale-up
    * experiment (ScaleCorpus) needs copies that keep the base
    * corpus's shape statistics. Default false = reference semantics. */
  private[sources] def transform(g: Geometry, rng: scala.util.Random,
                                 translateOnly: Boolean = false): Geometry = {
    def coords(cs: Array[Coordinate]): Array[Coordinate] = cs.map { c =>
      val shift = 0.5 + rng.nextDouble() * 1.0
      rng.nextInt(3) match {
        case 0 => new Coordinate(c.x + shift, c.y + shift)
        case 1 => new Coordinate(c.x - shift, c.y - shift)
        case _ if translateOnly => new Coordinate(c.x + shift, c.y - shift)
        case _ => new Coordinate(c.x * shift, c.y * shift)
      }
    }
    // close each ring explicitly: per-coordinate jitter would tear it
    // (first/last must stay equal for a valid ring)
    def ring(r: org.locationtech.jts.geom.LinearRing): org.locationtech.jts.geom.LinearRing = {
      val cs = coords(r.getCoordinates.dropRight(1))
      gf.createLinearRing(cs :+ cs.head.copy())
    }
    g match {
      case _ if g.isEmpty => g // POINT EMPTY etc.: nothing to perturb
      case p: org.locationtech.jts.geom.Point =>
        gf.createPoint(coords(p.getCoordinates).head)
      case r: org.locationtech.jts.geom.LinearRing =>
        ring(r) // must stay closed — before the LineString arm
      case l: org.locationtech.jts.geom.LineString
          if l.getGeometryType == Geometry.TYPENAME_LINESTRING =>
        gf.createLineString(coords(l.getCoordinates))
      case p: org.locationtech.jts.geom.Polygon =>
        // shell and holes jitter as separate rings — getCoordinates
        // concatenates them, and rebuilding that as one ring would
        // destroy the holes and self-intersect
        gf.createPolygon(ring(p.getExteriorRing),
          Array.tabulate(p.getNumInteriorRing)(i => ring(p.getInteriorRingN(i))))
      case _ if g.getNumGeometries >= 1 && g.getGeometryType.startsWith("Multi") =>
        gf.buildGeometry(java.util.Arrays.asList(
          (0 until g.getNumGeometries)
            .map(i => transform(g.getGeometryN(i), rng, translateOnly)): _*))
      case c: org.locationtech.jts.geom.GeometryCollection =>
        // single- and multi-member collections alike: every member moves
        gf.createGeometryCollection(Array.tabulate(c.getNumGeometries)(i =>
          transform(c.getGeometryN(i), rng, translateOnly)))
      case _ => g
    }
  }

  /** `times` jittered copies of an entity frame (`id`, `geom` WKB
    * columns): one output row per (entity, copy), ids suffixed `~<i>`
    * so the unique-entity-id contract holds across copies. Feed the
    * result back through `SpatialJoin.entities` via the `wkt` column. */
  def jitteredCopies(entities: DataFrame, times: Int,
                     seed: Long = 42L): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    val copies: Dataset[(String, String)] =
      entities.select(col("id").cast("string"), col("geom"))
        .as[(String, Array[Byte])]
        .flatMap { case (id, wkb) =>
          val g = graft.functions.Jts.fromWkb(wkb)
          (1 to times).map { i =>
            (s"$id~$i", transform(g, new scala.util.Random(rowSeed(seed, i, id))).toText)
          }
        }
    copies.toDF("id", "wkt")
  }

  /** 64-bit per-row seed: md5-fold of (seed, copy, id). String.hashCode
    * is 32-bit and collision-prone — two entities colliding there would
    * receive identical jitter streams; a 128→64-bit md5 fold makes
    * that astronomically unlikely. */
  private[sources] def rowSeed(seed: Long, copy: Int, id: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$copy:$id".getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong ^
      java.nio.ByteBuffer.wrap(d, 8, 8).getLong
  }
}

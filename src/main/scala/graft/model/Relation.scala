package graft.model

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.PreparedGeometry

/** DE-9IM topological relations the engine verifies — the query
  * vocabulary of the reference system (DS-JedAI
  * `utils/configuration/Constants.scala:14-37`). `inverse` supports
  * swap-based planning (verify the cheaper side as build);
  * `evalPrepared` is the PreparedGeometry fast path (reference
  * `model/entities/PreparedEntity.scala:18-32`).
  */
sealed abstract class Relation(val name: String) {
  def eval(a: Geometry, b: Geometry): Boolean
  def inverse: Relation
  /** Prepared-left evaluation; defaults to the plain JTS call. */
  def evalPrepared(a: PreparedGeometry, b: Geometry): Boolean = eval(a.getGeometry, b)
}

object Relation {
  case object Intersects extends Relation("intersects") {
    def eval(a: Geometry, b: Geometry) = a.intersects(b); def inverse = Intersects
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.intersects(b)
  }
  case object Contains extends Relation("contains") {
    def eval(a: Geometry, b: Geometry) = a.contains(b); def inverse = Within
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.contains(b)
  }
  case object Within extends Relation("within") {
    def eval(a: Geometry, b: Geometry) = a.within(b); def inverse = Contains
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.within(b)
  }
  case object Covers extends Relation("covers") {
    def eval(a: Geometry, b: Geometry) = a.covers(b); def inverse = CoveredBy
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.covers(b)
  }
  case object CoveredBy extends Relation("coveredby") {
    def eval(a: Geometry, b: Geometry) = a.coveredBy(b); def inverse = Covers
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.coveredBy(b)
  }
  case object Crosses extends Relation("crosses") {
    def eval(a: Geometry, b: Geometry) = a.crosses(b); def inverse = Crosses
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.crosses(b)
  }
  case object Overlaps extends Relation("overlaps") {
    def eval(a: Geometry, b: Geometry) = a.overlaps(b); def inverse = Overlaps
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.overlaps(b)
  }
  case object Touches extends Relation("touches") {
    def eval(a: Geometry, b: Geometry) = a.touches(b); def inverse = Touches
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.touches(b)
  }
  case object Equals extends Relation("equals") {
    def eval(a: Geometry, b: Geometry) = a.equalsTopo(b); def inverse = Equals
  }
  case object Disjoint extends Relation("disjoint") {
    def eval(a: Geometry, b: Geometry) = a.disjoint(b); def inverse = Disjoint
    override def evalPrepared(a: PreparedGeometry, b: Geometry) = a.disjoint(b)
  }

  val all: Seq[Relation] = Seq(Intersects, Contains, Within, Covers,
    CoveredBy, Crosses, Overlaps, Touches, Equals, Disjoint)

  def of(name: String): Relation =
    all.find(_.name == name.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown relation: $name"))
}

package graft.model

import org.locationtech.jts.geom.Geometry

/** DE-9IM topological relations the engine verifies — the query
  * vocabulary of the reference system (DS-JedAI
  * `utils/configuration/Constants.scala:14-37`). `inverse` supports
  * swap-based planning (verify the cheaper side as build).
  */
sealed abstract class Relation(val name: String) {
  def eval(a: Geometry, b: Geometry): Boolean
  def inverse: Relation
}

object Relation {
  case object Intersects extends Relation("intersects") {
    def eval(a: Geometry, b: Geometry) = a.intersects(b); def inverse = Intersects
  }
  case object Contains extends Relation("contains") {
    def eval(a: Geometry, b: Geometry) = a.contains(b); def inverse = Within
  }
  case object Within extends Relation("within") {
    def eval(a: Geometry, b: Geometry) = a.within(b); def inverse = Contains
  }
  case object Covers extends Relation("covers") {
    def eval(a: Geometry, b: Geometry) = a.covers(b); def inverse = CoveredBy
  }
  case object CoveredBy extends Relation("coveredby") {
    def eval(a: Geometry, b: Geometry) = a.coveredBy(b); def inverse = Covers
  }
  case object Crosses extends Relation("crosses") {
    def eval(a: Geometry, b: Geometry) = a.crosses(b); def inverse = Crosses
  }
  case object Overlaps extends Relation("overlaps") {
    def eval(a: Geometry, b: Geometry) = a.overlaps(b); def inverse = Overlaps
  }
  case object Touches extends Relation("touches") {
    def eval(a: Geometry, b: Geometry) = a.touches(b); def inverse = Touches
  }
  case object Equals extends Relation("equals") {
    def eval(a: Geometry, b: Geometry) = a.equalsTopo(b); def inverse = Equals
  }
  case object Disjoint extends Relation("disjoint") {
    def eval(a: Geometry, b: Geometry) = a.disjoint(b); def inverse = Disjoint
  }

  val all: Seq[Relation] = Seq(Intersects, Contains, Within, Covers,
    CoveredBy, Crosses, Overlaps, Touches, Equals, Disjoint)

  def of(name: String): Relation =
    all.find(_.name == name.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown relation: $name"))
}

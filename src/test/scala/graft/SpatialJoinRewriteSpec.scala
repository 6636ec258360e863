package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions
import graft.operators.SpatialJoin
import graft.functions.GeomFunctions._

/** The declarative surface: a plain inner join whose condition is a
  * spatial predicate gets rewritten by the injected optimizer rule
  * into the tile filter-refine plan (no cartesian product), with
  * results identical to brute force.
  */
class SpatialJoinRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    // extensions apply only at session construction: replace any
    // session other suites may have created
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("graft.theta.x", "4.0")
      .config("graft.theta.y", "4.0")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  private def entitiesDf(rows: Seq[(String, String)], prefix: String): DataFrame = {
    import spark.implicits._
    val e = SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
    e.columns.foldLeft(e)((d, c) => d.withColumnRenamed(c, prefix + c))
  }

  test("st_* functions are callable from SQL with the extension installed") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT st_area(st_geomfromwkt('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))')) AS a,
                st_numpoints(st_geomfromwkt('LINESTRING(0 0, 1 1, 2 2)')) AS n,
                st_predicate(st_geomfromwkt('POINT(1 1)'),
                             st_geomfromwkt('POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))'),
                             'within') AS w,
                st_relate(st_geomfromwkt('POINT(1 1)'),
                          st_geomfromwkt('POINT(1 1)')).equals AS eq
      """).head()
    assert(row.getDouble(0) === 16.0)
    assert(row.getInt(1) === 3)
    assert(row.getBoolean(2))
    assert(row.getBoolean(3))
  }

  test("st_predicate join is rewritten to the tile plan and matches " +
       "brute force") {
    spark.sparkContext.setLogLevel("WARN")
    val src = entitiesDf(TestGeoms.corpus(seed = 71, n = 60, world = 40), "s_")
    val tgt = entitiesDf(TestGeoms.corpus(seed = 72, n = 50, world = 40), "t_")
    val joined = src.join(tgt, st_predicate(col("s_geom"), col("t_geom"), "intersects"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"),
      s"expected tile rewrite, got cartesian:\n$phys")
    val got = joined.select("s_id", "t_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = SpatialJoin.relate(
      src.columns.foldLeft(src)((d, c) => d.withColumnRenamed(c, c.stripPrefix("s_"))),
      tgt.columns.foldLeft(tgt)((d, c) => d.withColumnRenamed(c, c.stripPrefix("t_"))),
      "intersects").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)

    // conjunction form: extra non-spatial predicate must also rewrite
    val mixed = src.join(tgt,
      st_predicate(col("s_geom"), col("t_geom"), "intersects") &&
      col("s_id") =!= col("t_id"))
    val mixedPhys = mixed.queryExecution.executedPlan.toString
    assert(!mixedPhys.contains("CartesianProduct"),
      s"And(spatial, other) not rewritten:\n$mixedPhys")
    val gotMixed = mixed.select("s_id", "t_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotMixed === expected.filter { case (a, b) => a != b })
  }

  test("rewrite derives θ from the source data when no conf is set") {
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.unset("graft.theta.x")
    spark.conf.unset("graft.theta.y")
    try {
      val src = entitiesDf(TestGeoms.corpus(seed = 81, n = 50, world = 40), "s_")
      val tgt = entitiesDf(TestGeoms.corpus(seed = 82, n = 40, world = 40), "t_")
      val joined = src.join(tgt,
        st_predicate(col("s_geom"), col("t_geom"), "intersects"))
      val phys = joined.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"),
        s"expected tile rewrite without conf θ, got cartesian:\n$phys")
      val got = joined.select("s_id", "t_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val expected = SpatialJoin.relate(
        src.columns.foldLeft(src)((d, c) => d.withColumnRenamed(c, c.stripPrefix("s_"))),
        tgt.columns.foldLeft(tgt)((d, c) => d.withColumnRenamed(c, c.stripPrefix("t_"))),
        "intersects").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("graft.theta.x", "4.0")
      spark.conf.set("graft.theta.y", "4.0")
    }
  }
}

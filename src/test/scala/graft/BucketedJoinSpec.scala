package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SpatialJoin

/** The co-located storage story: persist both relations bucketed by
  * the tile id; a later tile join between the bucketed tables runs
  * WITHOUT a shuffle exchange on either side (bucket pruning replaces
  * the exchange — this is what makes repeated 100 TB joins cheap).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .getOrCreate()
  }

  /** Drop the table AND its physical location. `getOrCreate` may hand
    * this suite a session created by another suite (default warehouse
    * under the repo), and a previously crashed JVM can leave an
    * orphaned table directory that the fresh catalog does not know —
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS. */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (dir.exists()) rm(dir)
  }

  test("tile-bucketed tables join without exchanges and match the " +
       "direct join") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.GeomFunctions._
    dropHard("src_bucketed")
    dropHard("tgt_bucketed")

    def entities(rows: Seq[(String, String)]) =
      SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
    val src = entities(TestGeoms.corpus(seed = 81, n = 150, world = 60))
    val tgt = entities(TestGeoms.corpus(seed = 82, n = 120, world = 60))
    val theta = SpatialJoin.computeTheta(src)

    def tiled(df: DataFrame): DataFrame =
      df.withColumn("tile", explode(tile_cover(
        col("minx"), col("miny"), col("maxx"), col("maxy"), theta.x, theta.y)))

    tiled(src).write.bucketBy(8, "tile").sortBy("tile")
      .mode("overwrite").saveAsTable("src_bucketed")
    tiled(tgt).write.bucketBy(8, "tile").sortBy("tile")
      .mode("overwrite").saveAsTable("tgt_bucketed")

    val s = spark.table("src_bucketed")
    val t = spark.table("tgt_bucketed")
    val joinedRaw = s.join(t, "tile")
      .filter(
        s("minx") <= t("maxx") && s("maxx") >= t("minx") &&
        s("miny") <= t("maxy") && s("maxy") >= t("miny"))
      .filter(st_predicate(s("geom"), t("geom"), "intersects"))
      .select(s("id").as("s_id"), t("id").as("t_id"))

    // the JOIN must be exchange-free (bucketed scans feed the
    // sort-merge join directly); the later distinct() aggregation
    // legitimately shuffles its small id-pair output
    val phys = joinedRaw.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$phys")
    assert(phys.contains("Bucketed: true"))

    val got = joinedRaw.distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = SpatialJoin.relate(src, tgt, "intersects")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expected)
  }
}

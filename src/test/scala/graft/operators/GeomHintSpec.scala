package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The geometry-carrying broadcast gate: row count alone must not
  * authorize broadcasting a frame of WKB blobs (ADVICE round-3: 500k
  * rows of 16 KB polygons is 8 GB). Object identity is the contract —
  * geomHinted returns the same frame when it refuses to hint. */
class GeomHintSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private def entitiesOf(rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    SpatialJoin.entities(rows.toDF("id", "wkt"), col("id"), col("wkt"))
  }

  private val small = entitiesOf(graft.TestGeoms.corpus(seed = 3, n = 20, world = 40))

  private val huge = entitiesOf((0 until 3).map { i =>
    val pts = (0 until 60000).map { j =>
      val a = 2 * math.Pi * j / 60000
      s"${50 + 30 * math.cos(a)} ${50 + 30 * math.sin(a)}"
    }
    (s"big$i", s"POLYGON((${pts.mkString(", ")}, ${pts.head}))")
  })

  test("small geometries + small budget: hint applied") {
    val df = small.select(col("id"), col("geom"))
    assert(Progressive.geomHinted(df, 1000, small) ne df)
  }

  test("budget over the row gate: no hint") {
    val df = small.select(col("id"), col("geom"))
    assert(Progressive.geomHinted(df, Progressive.BroadcastableBudget + 1, small) eq df)
  }

  test("huge geometries: the byte estimate blocks an otherwise " +
       "row-gated broadcast") {
    val df = huge.select(col("id"), col("geom"))
    // ~1 MB WKB each; 400k rows x 1 MB >> 256 MB cap, though 400k
    // passes the row gate
    assert(Progressive.geomHinted(df, 400000, huge) eq df)
    // and a genuinely tiny budget still broadcasts
    assert(Progressive.geomHinted(df, 100, huge) ne df)
  }
}

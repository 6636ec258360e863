package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Components

class ComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Brute-force union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("self-edges-only graph converges in the first round (the fused " +
       "convergence count sees zero changes immediately)") {
    assert(cc(Seq((7L, 7L), (9L, 9L))) === Map(7L -> 7L, 9L -> 9L))
  }

  test("reliable checkpointDir path (DFS-backed checkpoint) produces the " +
       "identical labelling and writes checkpoint data") {
    import spark.implicits._
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (21L, 22L), (40L, 41L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val viaReliable = Components.connectedComponents(
        edges.toDF("src", "dst"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaReliable === cc(edges))
    // the reliable path actually materialized RDD checkpoints on disk;
    // getCheckpointDir returns a file: URI of <root>/<uuid> (and a
    // suite running earlier in this shared context may have
    // established a different root — first dir wins, by contract)
    val rootStr = spark.sparkContext.getCheckpointDir.getOrElse(dir)
    val root =
      if (rootStr.startsWith("file:"))
        new java.io.File(new java.net.URI(rootStr))
      else new java.io.File(rootStr)
    def rddFiles(f: java.io.File): Boolean =
      f.isDirectory && (f.getName.startsWith("rdd-") ||
        Option(f.listFiles()).exists(_.exists(rddFiles)))
    assert(rddFiles(root),
      s"no rdd checkpoint directories under the reliable root $rootStr")
  }

  test("two chains and a clique resolve to their minima") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (21L, 22L), (22L, 20L),
      (40L, 41L))
    assert(cc(edges) === Map(
      3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      40L -> 40L, 41L -> 40L))
  }

  test("long path needs multiple propagation rounds") {
    // path 100 -> 99 -> ... -> 1: diameter 99, converges via min-label
    val edges = (1L until 100L).map(i => (i + 1, i))
    val got = cc(edges)
    assert(got.size === 100)
    assert(got.values.forall(_ == 1L))
  }

  test("random graph matches brute-force union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(edges) === unionFind(edges))
  }

  private def ccAlt(edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) =
      Components.connectedComponentsAlternating(edges.toDF("src", "dst"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("alternating large/small-star agrees with pointer jumping and " +
       "union-find across fuzzed graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val n = 20 + trial * 25
      val m = 10 + rnd.nextInt(3 * n)
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val expected = unionFind(edges)
        val (alt, rounds) = ccAlt(edges)
        assert(alt === expected, s"trial $trial")
        assert(alt === cc(edges), s"trial $trial vs pointer jumping")
        assert(rounds >= 1 && rounds < 50, s"trial $trial rounds=$rounds")
      }
    }
  }

  test("alternating form handles the giant path component it exists for") {
    // path of 200 vertices: diameter 199. Star contraction converges in
    // O(log n) alternations irrespective of the diameter.
    val edges = (1L until 200L).map(i => (i + 1, i))
    val (alt, rounds) = ccAlt(edges)
    assert(alt.size === 200)
    assert(alt.values.forall(_ == 1L))
    assert(rounds <= 12, s"rounds=$rounds not logarithmic")
  }

  test("alternating form on a pre-contracted star converges immediately") {
    val edges = (2L to 30L).map(i => (i, 1L))
    val (alt, rounds) = ccAlt(edges)
    assert(alt === (1L to 30L).map(i => i -> 1L).toMap)
    assert(rounds <= 2, s"rounds=$rounds")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  import spark.implicits._

  /** Symmetric edge frame from undirected pairs. */
  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def uniform(edges: org.apache.spark.sql.DataFrame) = {
    val nodes = edges.select(col("src").as("id")).distinct()
    val n = nodes.count()
    nodes.select(col("id"), lit(1.0 / n.toDouble).as("w"))
  }

  test("bfsHops on a path graph: exact hop distances, unreached nodes absent") {
    // 1-2-3-4-5-6-7, seed {1}, 4 hops: 5 is the frontier edge, 6/7 out
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)))
    val d = GraphOps.bfsHops(edges, Seq(1L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("bfsHops multi-source: distance is the min over seeds; isolated seed kept at 0") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    // seeds 1 and 5 meet in the middle; 99 has no edges but is a seed
    val d = GraphOps.bfsHops(edges, Seq(1L, 5L, 99L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 5L -> 0, 99L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfsHops differential: random graphs match a driver-side reference BFS") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + rnd.nextInt(40)
      val pairs = (0 until n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2).distinct
      val seeds = (0 until 3).map(_ => rnd.nextInt(n).toLong).distinct
      val maxHops = 1 + rnd.nextInt(4)
      // reference: breadth-first over the adjacency map
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> h)
        frontier = next
      }
      val got = GraphOps.bfsHops(sym(pairs), seeds.toDF("id"), maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === dist, s"trial $trial (n=$n, hops=$maxHops)")
    }
  }

  test("path graph a-b-c: one iteration matches the hand computation") {
    val edges = sym(Seq((1L, 2L), (2L, 3L)))
    val r = GraphOps.pagerank(edges, uniform(edges), iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // deg: 1→1, 2→2, 3→1; r0 = 1/3 each
    // r1(1) = .15/3 + .85·(1/3)/2 = 0.191666667 (round 9)
    // r1(2) = .15/3 + .85·(1/3 + 1/3)  = 0.616666667
    assert(r(1L) === 0.191666667)
    assert(r(2L) === 0.616666667)
    assert(r(3L) === 0.191666667)
  }

  test("mass conservation: rank sum stays 1 within rounding after 3 " +
       "iterations on an irregular graph") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (5L, 1L), (6L, 2L), (7L, 7L)))
    val total = GraphOps.pagerank(edges, uniform(edges), iters = 3)
      .agg(sum(col("pr"))).head().getDouble(0)
    // 7 nodes round at 5e-10 each → worst-case drift 3.5e-9/iteration
    assert(math.abs(total - 1.0) < 1e-7)
  }

  test("star graph: the hub outranks every leaf") {
    val edges = sym((2L to 9L).map(i => (1L, i)))
    val r = GraphOps.pagerank(edges, uniform(edges))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert((2L to 9L).forall(i => r(1L) > r(i)))
    // leaves are symmetric → identical ranks
    assert((3L to 9L).forall(i => r(i) === r(2L)))
  }

  test("personalized restart: a component disconnected from the seeds " +
       "keeps exactly 0.0 through every iteration") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val seeds = Seq(1L).toDF("id").select(col("id"), lit(1.0).as("w"))
    val r = GraphOps.pagerank(edges, seeds, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(10L) === 0.0 && r(11L) === 0.0)
    // seed-side mass stays 1 (the disconnected component holds none)
    assert(math.abs(r(1L) + r(2L) + r(3L) - 1.0) < 1e-7)
    // restart pulls the stationary mass toward the seed
    assert(r(1L) > r(3L))
  }

  test("delegated unit-weight path matches an INDEPENDENT pr/outdeg " +
       "implementation bit-for-bit (the form the unweighted oracles use)") {
    // pagerank delegates to pagerankWeighted with w=1; the gr1/gr2
    // DuckDB oracles stay in pr/outdeg form — this test re-derives the
    // claimed IEEE identity ((pr·1)/Σ1 ≡ pr/outdeg) with a separate
    // in-test implementation, so oracle-form drift would fail HERE,
    // not only at the driver's hash.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val edges = sym(pairs)
    val rst = uniform(edges)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = rst.select(col("id"), col("w").as("pr"))
    for (_ <- 1 to 3) {
      val contribs = edges.join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = rst.join(contribs, Seq("id"), "left")
        .select(col("id"), round(lit(0.15) * col("w") +
          lit(0.85) * coalesce(col("s"), lit(0.0)), 9).as("pr"))
    }
    val independent = ranks.collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val delegated = GraphOps.pagerank(edges, rst)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(delegated === independent)
  }

  test("weighted path a-3-b-1-c: one iteration matches the hand " +
       "computation and skews mass toward the heavy edge") {
    val edges = Seq((1L, 2L, 3L), (2L, 1L, 3L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val plain = edges.select(col("src"), col("dst"))
    val r = GraphOps.pagerankWeighted(edges, uniform(plain), iters = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // wsum: 1→3, 2→4, 3→1; r0 = 1/3
    // r1(1) = .15/3 + .85·(1/3)·(3/4) = 0.2625
    // r1(2) = .15/3 + .85·((1/3)·3/3 + (1/3)·1/1) = 0.616666667
    // r1(3) = .15/3 + .85·(1/3)·(1/4) = 0.120833333
    assert(r(1L) === 0.2625)
    assert(r(2L) === 0.616666667)
    assert(r(3L) === 0.120833333)
    assert(math.abs(r.values.sum - 1.0) < 1e-7)
  }

  test("gr1 gate: bipartite invariants on the interaction graph") {
    val out = GraphOps.gr1Pagerank(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // kinds follow the id namespacing
    assert(rows.forall(r =>
      (r.getLong(0) % 2 == 0) == (r.getString(1) == "customer")))
    val mass = rows.map(_.getDouble(3)).sum
    assert(math.abs(mass - 1.0) < 1e-5)
    // every node of a symmetric graph has degree >= 1
    assert(rows.forall(_.getLong(2) >= 1L))
  }

  test("gr2 gate: seed suppliers hold more mass per node than customers") {
    val out = GraphOps.gr2PersonalizedPagerank(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < 1e-5)
    // every rank is non-negative and the top-ranked node is a seed-side
    // supplier (restart mass dominates after 3 damped hops)
    assert(rows.forall(_.getDouble(2) >= 0.0))
    val top = rows.maxBy(_.getDouble(2))
    assert(top.getString(1) == "supplier")
  }

  test("triangle counts: K4 + pendant + disjoint edge, hand-checked") {
    // K4 on 1..4 (every node in C(3,2)=3 triangles), pendant 4-5,
    // disjoint edge 6-7 (triangle-free nodes report 0)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L)).toDF("a", "b")
    val r = GraphOps.triangleCounts(pairs)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) === ((3L, 3L)) && r(2L) === ((3L, 3L)) &&
      r(3L) === ((3L, 3L)))
    assert(r(4L) === ((4L, 3L))) // K4 member + the pendant edge
    assert(r(5L) === ((1L, 0L)))
    assert(r(6L) === ((1L, 0L)) && r(7L) === ((1L, 0L)))
  }

  test("triangle counts: degree-oriented engine matches the naive " +
       "id-ordered 3-join on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 400).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("a", "b")
    pairs.persist()
    val fast = GraphOps.triangleCounts(pairs)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // naive: enumerate (a<b<c) triangles by id order, count incidences
    val e = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val tris = for {
      (a, b) <- e.toSeq; c <- nodes.toSeq
      if b < c && e.contains((b, c)) && e.contains((a, c))
    } yield (a, b, c)
    val cnt = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val naive = nodes.map(n =>
      (n, deg(n), cnt.getOrElse(n, 0L)))
    assert(fast === naive)
    pairs.unpersist()
  }

  test("co-occurrence projection: shared counts hand-checked and the " +
       "hub cap drops an over-degree key entirely") {
    // key 10 links {1,2,3}; key 11 links {2,3}; key 12 (hub) links
    // {1,2,3,4,5} — with maxPerKey=4 the hub contributes nothing
    val links = (Seq(1L, 2L, 3L).map((10L, _)) ++
      Seq(2L, 3L).map((11L, _)) ++
      Seq(1L, 2L, 3L, 4L, 5L).map((12L, _))).toDF("k", "v")
    val r = GraphOps.cooccurrencePairs(links, minShared = 1L, maxPerKey = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r === Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L))
    // without the cap the hub's wedges appear
    val all = GraphOps.cooccurrencePairs(links, minShared = 1L, maxPerKey = 100)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(all((4L, 5L)) === 1L && all((2L, 3L)) === 3L)
    // minShared filters singleton evidence
    val strong = GraphOps.cooccurrencePairs(links, minShared = 2L, maxPerKey = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(strong === Set((2L, 3L)))
  }

  test("label propagation: two triangles + bridge converge to two " +
       "communities, hand-traced through all 3 synchronous rounds") {
    val edges = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)))
    val got = GraphOps.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r1: 1→2 2→1 3→1 4→3 5→4 6→4; r2: 1→1 2→1 3→1 4→4 5→3 6→3;
    // r3: the two triangles settle on their min members
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("label propagation tie-break: equal neighbor-label counts pick " +
       "the smallest label") {
    // path 1-2-3 after one round: node 2 sees {1, 3} once each -> 1
    val edges = sym(Seq((1L, 2L), (2L, 3L)))
    val got = GraphOps.labelPropagation(edges, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("k-core: clique survives with in-core degrees, an attached chain " +
       "peels away over multiple rounds") {
    // 5-clique (degrees 4) + chain 5-6-7-8 hanging off node 5: chain
    // nodes have degree <= 3, so the 4-core is exactly the clique —
    // but the peel takes multiple rounds (8 goes first, then 7, ...)
    val clique = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val edges = sym(clique ++ chain)
    val core = GraphOps.kcore(edges, k = 4, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === (1L to 5L).map(_ -> 4L).toMap)
  }

  test("k-core: a graph with no k-core converges to the empty frame") {
    val path = sym((1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq)
    assert(GraphOps.kcore(path, k = 2, maxRounds = 8).count() === 0L)
  }

  test("k-core: the round cap trips loudly on a slow peel instead of " +
       "running unbounded") {
    // 10-node path, k=2: each batched round only removes the two
    // current endpoints -> needs 5 rounds; cap at 2 must throw
    val path = sym((1L to 10L).sliding(2).map(s => (s(0), s(1))).toSeq)
    val e = intercept[IllegalArgumentException] {
      GraphOps.kcore(path, k = 2, maxRounds = 2).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("gr6 gate at sf0.001: result equals a driver-side sequential peel " +
       "of the collected graph") {
    val dir = "/root/testdata/sf0.001"
    val edges = GraphOps.interactionEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: recompute the 30-core by batched peeling
    // over an in-memory adjacency map
    var adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var changed = true
    while (changed) {
      val bad = adj.collect { case (n, nb) if nb.size < 30 => n }.toSet
      changed = bad.nonEmpty
      if (changed)
        adj = adj.collect { case (n, nb) if !bad(n) => n -> (nb -- bad) }
    }
    val expect = adj.map { case (n, nb) => n -> nb.size.toLong }
    val got = GraphOps.gr6Kcore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("minPlusSssp: weighted triangle hand-checked — the cheap 2-edge " +
       "path beats the direct heavy edge") {
    val edges = Seq((1L, 2L, 5L), (2L, 1L, 5L), (2L, 3L, 1L), (3L, 2L, 1L),
      (1L, 3L, 10L), (3L, 1L, 10L)).toDF("src", "dst", "w")
    val d = GraphOps.minPlusSssp(edges, Seq(1L).toDF("id"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 5L, 3L -> 6L))
  }

  test("minPlusSssp differential: random weighted graphs match a " +
       "driver-side round-limited Bellman-Ford") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 5) {
      val n = 20 + rnd.nextInt(30)
      val pairs = (0 until n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(9))
      }.filter(p => p._1 != p._2).distinctBy(p => (p._1, p._2))
      val sym = pairs ++ pairs.map(p => (p._2, p._1, p._3))
      val seeds = (0 until 3).map(_ => rnd.nextInt(n).toLong).distinct
      val rounds = 1 + rnd.nextInt(4)
      // reference: synchronous round-limited relaxation
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relaxed = sym.flatMap { case (u, v, w) =>
          dist.get(u).map(du => v -> (du + w))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      val got = GraphOps.minPlusSssp(sym.toDF("src", "dst", "w"),
          seeds.toDF("id"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === dist, s"n=$n rounds=$rounds")
    }
  }

  test("neighborhoodJaccard on a hand graph: exact commons, degrees, ratios") {
    // square 1-2-3-4 with chord 1-3: N(1)={2,3,4} N(2)={1,3}
    // N(3)={1,2,4} N(4)={1,3}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val got = GraphOps.neighborhoodJaccard(pairs, minCommon = 1L, maxHubDeg = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got === Map(
      (1L, 2L) -> (1L, 3L, 2L, 0.25),
      (1L, 3L) -> (2L, 3L, 3L, 0.5),
      (1L, 4L) -> (1L, 3L, 2L, 0.25),
      (2L, 3L) -> (1L, 2L, 3L, 0.25),
      (2L, 4L) -> (2L, 2L, 2L, 1.0),
      (3L, 4L) -> (1L, 3L, 2L, 0.25)))
    // minCommon=2 keeps only the two 2-common pairs
    val strict = GraphOps.neighborhoodJaccard(pairs, minCommon = 2L, maxHubDeg = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict === Set((1L, 3L), (2L, 4L)))
  }

  test("gr11 gate at sf0.001: coefficients match a driver-side naive " +
       "recompute over the collected co-purchase graph, bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val e = GraphOps.gr5CopurchasePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val adj = (e.toSeq ++ e.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expect = nodes.map { n =>
      val nb = adj(n); val d = nb.size.toLong
      val tri = nb.toSeq.combinations(2).count { p =>
        val (x, y) = (math.min(p(0), p(1)), math.max(p(0), p(1)))
        e.contains((x, y))
      }.toLong
      val lcc = if (d >= 2) (2.0 * tri) / (d * (d - 1)) else 0.0
      n -> ((d, tri, lcc))
    }.toMap
    val got = GraphOps.gr11ClusteringCoeff(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === expect)
  }

  test("gr12: modularity of two clean triangle communities is the " +
       "hand-computed optimum shape; contributions match the formula") {
    // two triangles + bridge — LP settles on communities {1,2,3} {4,5,6}
    // (hand-traced above). m=7 edges; each community: e_c=3 intra,
    // d_c = 2+2+3 = 7 (one bridge endpoint per side has degree 3).
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val e = sym(pairs)
    val labels = GraphOps.labelPropagation(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = pairs.size.toLong
    val expect = labels.groupBy(_._2).map { case (c, members) =>
      val ids = members.keySet
      val ec = pairs.count(p => ids(p._1) && ids(p._2)).toLong
      val dc = ids.toSeq.map(n =>
        pairs.count(p => p._1 == n || p._2 == n).toLong).sum
      val q = (ec.toDouble / m) -
        (dc.toDouble / (2 * m)) * (dc.toDouble / (2 * m))
      c -> ((ids.size.toLong, ec, dc, q))
    }
    assert(expect.values.map(_._2).sum === 6L) // bridge is inter-community
    // both communities have the same positive contribution: 3/7 - (7/14)^2
    assert(expect.values.forall(v => v._4 === 3.0 / 7 - 0.25))
    // the operator's per-community rows (driver formula re-derived on a
    // hand graph; the gate itself is oracle-gated at every SF)
    assert(expect.values.forall(v => v._4 > 0.0))
  }

  test("gr12 gate at sf0.001: per-community rows match a driver-side " +
       "recompute from collected pairs and labels, bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val pairs = GraphOps.gr5CopurchasePairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = GraphOps.gr7LabelProp(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = pairs.length.toLong
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expect = labels.groupBy(_._2).map { case (c, members) =>
      val ids = members.keySet
      val ec = pairs.count(p => ids(p._1) && ids(p._2)).toLong
      val dc = ids.toSeq.map(deg).sum
      val q = (ec.toDouble / m) -
        (dc.toDouble / (2 * m)) * (dc.toDouble / (2 * m))
      c -> ((ids.size.toLong, ec, dc, q))
    }
    val got = GraphOps.gr12Modularity(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expect)
    // total modularity is a sane clustering-quality value
    val total = got.values.map(_._4).sum
    assert(total > 0.0 && total <= 1.0)
  }

  test("neighborhoodJaccard hub prune: hub neighbors leave both the " +
       "intersection and the union") {
    // star: hub 100 — {1..5}, plus edge 1-2. deg(100)=5.
    val pairs = ((1L to 5L).map(i => (i, 100L)) :+ (1L, 2L)).toDF("a", "b")
    // cap 3 drops 100 from every profile: N'(1)={2}, N'(2)={1},
    // N'(3..5)={}, N'(100)={1..5}; only wedges through 1 and 2 remain
    val capped = GraphOps.neighborhoodJaccard(pairs, 1L, maxHubDeg = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(capped === Map(
      (1L, 100L) -> (1L, 1L, 5L, 0.2),
      (2L, 100L) -> (1L, 1L, 5L, 0.2)))
    // uncapped, the pairs {1..5}² all share the hub
    val open = GraphOps.neighborhoodJaccard(pairs, 1L, maxHubDeg = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1L to 5L).combinations(2).forall(p => open((p(0), p(1)))))
  }
}

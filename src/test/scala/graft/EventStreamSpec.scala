package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** Batch/stream parity: the streaming hourly aggregation over static
  * parquet must produce exactly the batch result.
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  test("stream-static spatial enrichment: streamed points joined to " +
       "static regions match the batch join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // static side: part boxes as regions (id, bounds)
    val boxes = graft.operators.SpatialJoin.entities(
      graft.Tables.part(spark, dir).select(col("p_partkey").as("id"),
        concat(lit("POLYGON(("),
          (col("p_partkey") * 13) % 980, lit(" "), (col("p_partkey") * 29) % 980, lit(", "),
          (col("p_partkey") * 13) % 980 + 20, lit(" "), (col("p_partkey") * 29) % 980, lit(", "),
          (col("p_partkey") * 13) % 980 + 20, lit(" "), (col("p_partkey") * 29) % 980 + 20, lit(", "),
          (col("p_partkey") * 13) % 980, lit(" "), (col("p_partkey") * 29) % 980 + 20, lit(", "),
          (col("p_partkey") * 13) % 980, lit(" "), (col("p_partkey") * 29) % 980,
          lit("))")).as("wkt")),
      col("id"), col("wkt"))
      .select(col("id").as("box_id"), col("minx"), col("miny"),
        col("maxx"), col("maxy"))
    def enrich(events: org.apache.spark.sql.DataFrame) = {
      val px = (col("user_id") * 17) % 1000
      val py = (col("event_id") * 23) % 1000
      events.select(col("event_id"), px.as("px"), py.as("py"))
        .join(broadcast(boxes),
          col("px") > col("minx") && col("px") < col("maxx") &&
          col("py") > col("miny") && col("py") < col("maxy"))
        .select(col("event_id"), col("box_id"))
    }
    val q = enrich(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched_test").start()
    q.processAllAvailable()
    try {
      val streamed = spark.table("enriched_test").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val batch = enrich(graft.Tables.events(spark, dir)).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionizer: incremental gap-close and event-time " +
       "timeout emit each session exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Timeline base = day 1, not epoch 0: the stateful operator's
    // late-row filter drops rows at exactly the initial zero watermark.
    def m(minutes: Long): Long = (minutes + 1440) * 60L * 1000000L
    val mem = MemoryStream[(Long, Long, Long)] // (user_id, event_id, us)
    val events = mem.toDF().toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = graft.streaming.EventStream.sessionize(events, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_test").start()
    def sessions(): Set[(Long, Long, Long, Long)] =
      spark.table("sess_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      // batch 1: A has two events 10 min apart (one open session),
      // B one event; nothing closes (watermark far behind)
      mem.addData((1L, 1L, m(0)), (1L, 2L, m(10)), (2L, 3L, m(0)))
      q.processAllAvailable()
      assert(sessions() === Set.empty)
      // batch 2: A's event 190 min later exceeds the 30-min gap -> A's
      // first session closes by DATA. The eviction watermark advances
      // within the trigger to 200 - 120 lateness = 80 min, which passes
      // B's timeout (last + gap = 30 min) -> B closes by TIMEOUT.
      mem.addData((1L, 4L, m(200)))
      q.processAllAvailable()
      assert(sessions() === Set(
        (1L, m(0), m(10), 2L), (2L, m(0), m(0), 1L)))
      // batch 3: unrelated user pushes the eviction watermark to
      // 880 min, past A's open-session timeout (230 min) -> A's second
      // session times out; the new user's own session stays open
      mem.addData((9L, 5L, m(1000)))
      q.processAllAvailable()
      assert(sessions() === Set(
        (1L, m(0), m(10), 2L), (2L, m(0), m(0), 1L), (1L, m(200), m(200), 1L)))
    } finally q.stop()
  }

  test("late events within the watermark merge backwards into the open " +
       "session or close immediately as strays") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(minutes: Long): Long = (minutes + 1440) * 60L * 1000000L
    val mem = MemoryStream[(Long, Long, Long)]
    val events = mem.toDF().toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = graft.streaming.EventStream.sessionize(events, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late").start()
    def sessions(): Set[(Long, Long, Long, Long)] =
      spark.table("sess_late").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      mem.addData((1L, 1L, m(100)), (1L, 2L, m(110))) // open [100, 110]
      q.processAllAvailable()
      assert(sessions() === Set.empty)
      // batch 2, both events LATE but within the 2h watermark:
      //  40' is >gap before the open start -> closes immediately as a
      //  stray singleton; 85' is within the gap of start 100' -> the
      //  open session extends backwards
      mem.addData((1L, 3L, m(40)), (1L, 4L, m(85)))
      q.processAllAvailable()
      assert(sessions() === Set((1L, m(40), m(40), 1L)))
      // far-future user flushes the (now backwards-extended) session
      mem.addData((9L, 5L, m(2000)))
      q.processAllAvailable()
      assert(sessions() === Set(
        (1L, m(40), m(40), 1L), (1L, m(85), m(110), 3L)))
    } finally q.stop()
  }

  test("late strays bridging each other form ONE session; a stray chain " +
       "reaching the open session's start merges into it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(minutes: Long): Long = (minutes + 1440) * 60L * 1000000L
    val mem = MemoryStream[(Long, Long, Long)]
    val events = mem.toDF().toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = graft.streaming.EventStream.sessionize(events, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_strays").start()
    def sessions(): Set[(Long, Long, Long, Long)] =
      spark.table("sess_strays").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    try {
      // both users open [100, 110]
      mem.addData((1L, 1L, m(100)), (1L, 2L, m(110)),
                  (2L, 3L, m(100)), (2L, 4L, m(110)))
      q.processAllAvailable()
      assert(sessions() === Set.empty)
      // user 1: strays 20' and 40' bridge each other (20 min <= gap)
      // but end >gap before 100' -> ONE two-event stray session, not
      // two singletons (the batch q14 semantics).
      // user 2: strays 45' and 72' chain (27 min <= gap) and the chain
      // reaches within the gap of 100' -> merges INTO the open session.
      mem.addData((1L, 5L, m(20)), (1L, 6L, m(40)),
                  (2L, 7L, m(45)), (2L, 8L, m(72)))
      q.processAllAvailable()
      assert(sessions() === Set((1L, m(20), m(40), 2L)))
      // far-future user flushes both open sessions
      mem.addData((9L, 9L, m(3000)))
      q.processAllAvailable()
      assert(sessions() === Set(
        (1L, m(20), m(40), 2L),
        (1L, m(100), m(110), 2L),
        (2L, m(45), m(110), 4L)))
    } finally q.stop()
  }

  test("streaming dedup emits each event_id once within the watermark " +
       "window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(minutes: Long): Long = (minutes + 1440) * 60L * 1000000L
    val mem = MemoryStream[(Long, Long)] // (event_id, us)
    val events = mem.toDF().toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = graft.streaming.EventStream.dedupe(events)
      .select("event_id").writeStream.outputMode("append").format("memory")
      .queryName("dedup_test").start()
    def ids(): Seq[Long] =
      spark.table("dedup_test").collect().map(_.getLong(0)).toSeq
    try {
      // same-batch duplicate + distinct ids
      mem.addData((1L, m(10)), (1L, m(10)), (2L, m(11)))
      q.processAllAvailable()
      assert(ids().sorted === Seq(1L, 2L))
      // cross-batch duplicate within the watermark: dropped
      mem.addData((1L, m(12)), (3L, m(13)))
      q.processAllAvailable()
      assert(ids().sorted === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join replayed over the events table " +
       "matches the batch tj2 pair-for-pair") {
    val dir = "/root/testdata/sf0.001"
    val got = EventStream.intervalJoinGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = graft.operators.EventOps.tj2IntervalJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "corpus yields no pairs — test is vacuous")
  }

  test("LEFT OUTER stream-stream interval join (st9): matched pairs equal " +
       "the inner join, unmatched errors emit null-padded on eviction") {
    val dir = "/root/testdata/sf0.001"
    val got = EventStream.intervalJoinOuterGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inner = graft.operators.EventOps.tj2IntervalJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val allErrors = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    // matched rows are exactly the inner join's pairs
    assert(got.filter(_._2 >= 0) == inner)
    // unmatched rows: every error with no pair, exactly once, null-padded
    val unmatched = got.filter(_._2 == -1L)
    assert(unmatched.map(_._1) == allErrors -- inner.map(_._1))
    assert(unmatched.forall(_._3 == 0L))
    assert(unmatched.nonEmpty,
      "corpus leaves no unmatched errors — outer test is vacuous")
    // every error surfaced
    assert(got.map(_._1) == allErrors)
  }

  test("native session_window gate (st10) equals the custom sessionizer " +
       "gate (st1) row for row") {
    val dir = "/root/testdata/sf0.001"
    val native = EventStream.sessionWindowGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val custom = EventStream.sessionizeGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(native.nonEmpty && native == custom)
  }

  test("full-outer gate (st15) restricted to the error side equals the " +
       "left-outer gate (st9); the rest are exactly the unmatched clicks") {
    val dir = "/root/testdata/sf0.001"
    val full = EventStream.fullOuterGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val left = EventStream.intervalJoinOuterGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.filter(_._1 >= 0).toSet == left.toSet)
    val rightOnly = full.filter(_._1 < 0)
    assert(rightOnly.forall(r => r._2 >= 0 && r._3 == 0L))
    // a click is right-only iff it matched no error in the left gate
    val matchedClicks = left.map(_._2).filter(_ >= 0).toSet
    assert(rightOnly.map(_._2).toSet.intersect(matchedClicks).isEmpty)
  }

  test("transformWithState gate (st14) equals the flatMapGroupsWithState " +
       "gate (st1) row for row — three sessionizer engines, one answer") {
    val dir = "/root/testdata/sf0.001"
    val tws = EventStream.sessionizeTwsGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val custom = EventStream.sessionizeGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(tws.nonEmpty && tws == custom)
  }

  test("streaming funnel (st11) equals the batch tj3 funnel row for row") {
    val dir = "/root/testdata/sf0.001"
    val stream = EventStream.funnelGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    val batch = graft.operators.EventOps.tj3Funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    assert(stream.nonEmpty && stream == batch)
  }

  test("streaming funnel: a view arriving one batch LATE (within the " +
       "watermark) still qualifies its click — buffer finalization") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h(hours: Long): Long = (hours + 24) * 3600L * 1000000L
    val mem = MemoryStream[(Long, Long, String, Long)]
    val events = mem.toDF().toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.funnel(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_late").start()
    def hits(): Set[(Long, Long, Long, Long, Long)] =
      spark.table("funnel_late").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    try {
      // batch 1: click@2h and purchase@3h arrive FIRST (watermark
      // advances to 3h - 2h lateness = 1h -> nothing finalizes)
      mem.addData((1L, 21L, "click", h(2)), (1L, 31L, "purchase", h(3)))
      q.processAllAvailable()
      assert(hits() === Set.empty)
      // batch 2: the view@1.5h arrives late but STRICTLY above the 1h
      // watermark (rows at exactly the watermark are dropped by the
      // late filter); once a watermark-pusher finalizes the prefix,
      // the chain replays in EVENT-TIME order: view -> click -> purchase
      mem.addData((1L, 11L, "view", h(1) + 1800L * 1000000L))
      q.processAllAvailable()
      mem.addData((-9L, -9L, "view", h(200)))
      q.processAllAvailable()
      assert(hits() === Set((31L, 1L, h(3), 21L, 11L)))
    } finally q.stop()
  }

  test("streaming funnel: step window enforced — a 25h-later purchase " +
       "does not complete, and a stale click register never matches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def h(hours: Long): Long = (hours + 24) * 3600L * 1000000L
    val mem = MemoryStream[(Long, Long, String, Long)]
    val events = mem.toDF().toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val q = EventStream.funnel(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_step").start()
    try {
      // user 1: view@0, click@1h, purchase@26h (26h-1h > 24h -> no hit)
      // user 2: simultaneous view/click/purchase at 5h -> the tie chain
      // completes (tr order: view before click before purchase)
      mem.addData((1L, 1L, "view", h(0)), (1L, 2L, "click", h(1)),
        (1L, 3L, "purchase", h(26)),
        (2L, 4L, "view", h(5)), (2L, 5L, "click", h(5)),
        (2L, 6L, "purchase", h(5)))
      q.processAllAvailable()
      mem.addData((-9L, -9L, "view", h(300)))
      q.processAllAvailable()
      val got = spark.table("funnel_step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got === Set((6L, 2L, h(5), 5L, 4L)))
    } finally q.stop()
  }

  test("session_window merge boundary is inclusive: exactly-gap-apart " +
       "events share a session, gap+1us splits — matching sessionize") {
    import spark.implicits._
    val gapUs = 30L * 60L * 1000000L
    val day = 86400L * 1000000L
    // batch session_window is the same operator semantics minus the
    // watermark machinery — probe the boundary there
    def sessions(offsetUs: Long): Long =
      Seq((1L, day), (1L, day + offsetUs)).toDF("user_id", "us")
        .withColumn("ts", timestamp_micros(col("us")))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .count().count()
    assert(sessions(gapUs) == 1L, "exact-gap pair must merge (inclusive)")
    assert(sessions(gapUs + 1L) == 2L, "gap+1us pair must split")
  }

  test("streaming hourly aggregation matches the batch query") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStream.runToMemory(spark, dir, "hourly_test")
    try {
      val streamed = spark.table("hourly_test")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = graft.Tables.events(spark, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("st13 latest-value snapshot == the batch argmax, every column") {
    val dir = "/root/testdata/sf0.001"
    val streamed = EventStream.snapshotGate(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toMap
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("m"))
      .select(col("user_id"), col("m.ts"), col("m.event_id"),
        col("m.event_type"), col("m.value"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("st13 snapshot state is one row per key (bounded by users, not events)") {
    val dir = "/root/testdata/sf0.001"
    val nUsers = graft.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    val nRows = EventStream.snapshotGate(spark, dir).count()
    assert(nRows === nUsers)
  }

  test("st12 left-semi stream-stream join == the batch semi join, each " +
       "matched error exactly once") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = EventStream.semiJoinGate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"), col("ts").as("ets"))
    val c = graft.Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val batch = e.join(c,
        e("user_id") === c("user_id") &&
          abs(unix_micros(col("cts")) - unix_micros(col("ets"))) <=
            lit(1800L) * 1000000L, "left_semi")
      .select(col("err_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.distinct.length, "a semi join must never dup")
    assert(got.sorted.toSeq === batch.sorted.toSeq)
    assert(got.nonEmpty)
  }

  test("file-source scale harnesses emit rows and report bounded state") {
    val dir = "/root/testdata/sf0.001"
    val (sec, rows, state) = EventStream.sessionizeFileStats(spark, dir)
    assert(sec > 0 && rows > 0, "no sessions emitted through the file source")
    val users = graft.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(state > 0 && state <= users,
      s"sessionizer state $state must be bounded by active users $users")
    val (jSec, jRows, jState) = EventStream.intervalJoinFileStats(spark, dir)
    assert(jSec > 0 && jRows > 0 && jState > 0)
    // join state buffers only rows the ±window can still match
    val errClicks = graft.Tables.events(spark, dir)
      .filter(col("event_type").isin("error", "click")).count()
    assert(jState <= errClicks,
      s"join state $jState exceeds its whole input $errClicks")
    // RocksDB provider (the 100 TB spill-capable store): same emitted
    // rows as the in-memory provider, state still bounded
    val (rSec, rRows, rState) = EventStream.sessionizeFileStats(spark, dir,
      Some(EventStream.RocksDbProvider))
    assert(rSec > 0 && rRows == rows,
      s"RocksDB run emitted $rRows sessions vs in-memory $rows")
    // the tuned preset (RocksDbTuning) sets trackTotalNumberOfRows=false
    // — skipping the per-put existence lookup is a documented trade
    // that zeroes the numRowsTotal metric; the in-memory twin above
    // carries the state curve. Accept a real count too in case a
    // future Spark restores it for free.
    // rState == -1 (listener saw no progress event) must stay red —
    // the relaxed 0-allowance is ONLY for trackTotalNumberOfRows=false
    assert(rState == 0 || (rState > 0 && rState <= users),
      s"RocksDB sessionizer state metric $rState must be 0 (tracking " +
        s"off) or in (0, $users]")
  }

  test("the dedupe gate's duplicate placement never routes a second " +
       "copy below the watermark") {
    // reconstruct the gate's chunking and check every re-delivered row
    // sits within the 2h lateness of the watermark its first delivery
    // could have advanced to (the round-7 advisory scenario)
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val rows = graft.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("us"), col("event_id"))
      .as[(Long, Long)].collect()
    val latenessUs = 2L * 3600L * 1000000L
    val chunk = math.max(1, (rows.length + 3) / 4)
    rows.grouped(chunk).foreach { batch =>
      val maxUs = batch.last._2
      val tail = batch.filter(_._2 > maxUs - latenessUs)
      // intra-batch copies (head) are never late by construction; the
      // cross-trigger copies are exactly `tail`, and each is above the
      // advanced watermark maxUs - lateness
      tail.foreach { case (_, us) =>
        assert(us > maxUs - latenessUs)
      }
      assert(tail.nonEmpty, "a chunk with no trailing window is malformed")
    }
  }

  test("chained stateful aggregations (st8): emitted days carry COMPLETE " +
       "batch-equal counts; only unfinalized days are withheld") {
    val dir = "/root/testdata/sf0.01"
    val streamed = EventStream.dailyRollupGate(spark, dir)
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(streamed.size > 100, "too few (type, day) groups — near-vacuous")
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"), date_trunc("day", col("hr")).as("day"))
      .agg(count(lit(1)).as("n_user_hours"), sum(col("n")).as("n_events"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val wm = graft.Tables.events(spark, dir)
      .agg(max(col("ts"))).head.getTimestamp(0).getTime - 2L * 3600 * 1000
    batch.foreach { case ((tpe, day), counts) =>
      val dayEnd = day.getTime + 24L * 3600 * 1000
      if (dayEnd <= wm)
        // finalized day: the chained pipeline must have emitted it with
        // counts identical to the one-shot batch rollup (every hour of
        // the day finalized before the day did)
        assert(streamed.get((tpe, day)).contains(counts),
          s"($tpe,$day): streamed ${streamed.get((tpe, day))} != batch $counts")
      else
        assert(!streamed.contains((tpe, day)),
          s"($tpe,$day): emitted although not finalized under the watermark")
    }
  }

  test("streaming CMS heavy hitters == batch q19 row-for-row, est >= exact") {
    val dir = "/root/testdata/sf0.01"
    val streamed = EventStream.heavyHittersGate(spark, dir, emitEstimate = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getBoolean(4), r.getLong(5)))
    assert(streamed.nonEmpty, "no heavy hitters — gate vacuous")
    // CMS merge is cellwise addition over identically-seeded registers,
    // so the union of the per-window STREAMED sketches must equal the
    // single batch-global sketch exactly — q19's output (incl. the raw
    // cms_n estimates) row for row, not merely within epsilon (q19
    // built at st6's eps for the twin)
    val batch = graft.operators.Analytics
      .q19FrequentUsers(spark, dir, k = 3, eps = 0.01, emitEstimate = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getBoolean(4), r.getLong(5)))
    assert(streamed.toSeq == batch.toSeq,
      "streamed merged CMS diverges from the batch-global sketch")
    streamed.foreach { case (t, u, exact, _, wb, est) =>
      assert(est >= exact, s"($t,$u): CMS under-counted $est < $exact")
      assert(wb, s"($t,$u): within_bounds false")
    }
  }

  test("streaming HLL sketch state == batch sketch bit-for-bit, ±5% of exact") {
    val dir = "/root/testdata/sf0.01"
    val streamed = EventStream.approxDistinctGate(spark, dir, emitEstimate = true)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(streamed.length > 50, "too few (type, hour) groups — near-vacuous")
    // batch twin over the same rows: HLL register merge is a
    // per-register max, so incremental micro-batched accumulation must
    // land on the IDENTICAL estimate, not merely a close one
    val batch = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(streamed.length == batch.size, "group sets differ")
    streamed.foreach { case (tpe, hour, approx, gateExact, wb) =>
      val (bApprox, exact) = batch((tpe, hour))
      assert(approx == bApprox,
        s"($tpe,$hour): stream sketch $approx != batch sketch $bApprox")
      assert(gateExact == exact,
        s"($tpe,$hour): gate exact $gateExact != batch exact $exact")
      assert(wb, s"($tpe,$hour): within_bounds false")
      // ±5% for real cardinalities; tiny groups (a handful of users)
      // ride HLL++'s small-range correction, which can still be off by
      // a count or two — allow an absolute slack of 2 there
      assert(math.abs(approx - exact) <= math.max(2.0, 0.05 * exact),
        s"($tpe,$hour): approx $approx vs exact $exact beyond bound")
    }
  }
}

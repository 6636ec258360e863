package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, EventOps, GeoQueries, GraphOps, Multimodal, ProgressiveQueries, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator module contributes a `queries` registry (name ->
  * (spark, sfDir) => DataFrame) and, where the semantics are ANSI-SQL
  * expressible, a DuckDB oracle under the same name. Column names are
  * aligned between both sides because the driver's comparator sorts
  * columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The engine's identity: holistic DE-9IM interlinking
    * relation counts (GIA.nt) over the derived geometry relations. */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.sp3RelationCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * st1 gates the STREAMING surface: the stateful sessionizer replayed
    * over the events table, hash-checked against the batch q14 oracle —
    * streaming/batch equivalence as a driver-verified fact. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ GeoQueries.queries ++ ProgressiveQueries.queries ++
      TextOps.queries ++ VectorOps.queries ++ Multimodal.queries ++
      EventOps.queries ++ GraphOps.queries ++
      Map(
        "st1_stream_sessionize" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.sessionizeGate(s, dir)),
        "st2_stream_interval_join" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.intervalJoinGate(s, dir)),
        "st3_stream_hourly" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.hourlyGate(s, dir)),
        "st4_stream_dedupe" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.dedupeGate(s, dir)),
        // hash-exact since round 9: exact payload + sketch-contract
        // boolean (estimate-level contracts stay in EventStreamSpec)
        "st5_stream_approx_distinct" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.approxDistinctGate(s, dir)),
        "st6_stream_heavy_hitters" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.heavyHittersGate(s, dir)),
        "st7_stream_enrich" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.enrichGate(s, dir)),
        "st8_stream_daily_rollup" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.dailyRollupGate(s, dir)),
        "st9_stream_outer_join" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.intervalJoinOuterGate(s, dir)),
        // the NATIVE session_window operator, same oracle as st1 — the
        // built-in and custom sessionizers share merge semantics down
        // to the inclusive gap boundary (spec-pinned), so they are
        // hash-verified equal
        "st10_session_window" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.sessionWindowGate(s, dir)),
        // streaming twin of the batch tj3 funnel — same oracle, so
        // streaming/batch funnel equivalence is driver-verified
        "st11_stream_funnel" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.funnelGate(s, dir)),
        // left-semi stream-stream join: the existence-check join shape
        // (match-driven emission, no sentinel needed)
        "st12_stream_semi_join" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.semiJoinGate(s, dir)),
        // latest-value snapshot per key: the CDC-upsert materialized
        // view (state = result, one max-struct row per key)
        "st13_stream_snapshot" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.snapshotGate(s, dir)),
        // the THIRD sessionizer engine: Spark 4 transformWithState
        // (StatefulProcessor + typed ValueState + event-time timers,
        // RocksDB-backed — TWS is RocksDB-only), same q14 oracle as
        // st1/st10: three engines, one hash
        "st14_tws_sessionize" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.sessionizeTwsGate(s, dir)),
        // FULL OUTER completes the stream-stream join matrix
        // (inner st2 / left st9 / semi st12 / full st15)
        "st15_stream_full_outer" -> ((s: SparkSession, dir: String) =>
          graft.streaming.EventStream.fullOuterGate(s, dir)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ GeoQueries.oracles ++ ProgressiveQueries.oracles ++
      TextOps.oracles ++ VectorOps.oracles ++ Multimodal.oracles ++
      EventOps.oracles ++ GraphOps.oracles ++
      Map(
        "st1_stream_sessionize" -> Analytics.oracles("q14_sessionize"),
        // native session_window ≡ custom sessionizer (identical
        // inclusive-boundary merge semantics, spec-pinned)
        "st10_session_window" -> Analytics.oracles("q14_sessionize"),
        // transformWithState engine ≡ the same sessions again
        "st14_tws_sessionize" -> Analytics.oracles("q14_sessionize"),
        "st2_stream_interval_join" -> EventOps.oracles("tj2_interval_join"),
        // q6 restricted to the streamed columns (the streaming agg has
        // no countDistinct: approximate distinct is the streaming-state
        // answer at scale and would not be hash-exact)
        "st3_stream_hourly" ->
          """SELECT event_type, date_trunc('hour', ts) AS hour,
             count(*) AS n_events, round(sum(value), 2) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        // the stream received every row TWICE; exactly-once dedup must
        // land back on the raw table's per-type cardinalities
        "st4_stream_dedupe" ->
          """SELECT event_type, count(*) AS n_unique
             FROM events GROUP BY 1 ORDER BY 1""",
        // st5/st6 (hash-exact since round 9): exact payload + literal
        // TRUE for the sketch-contract boolean — a broken sketch flips
        // the boolean on the Spark side and fails the hash
        "st5_stream_approx_distinct" ->
          """SELECT event_type, date_trunc('hour', ts) AS hour,
             count(DISTINCT user_id) AS exact_users, TRUE AS within_bounds
             FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        // st6 shares q19's probe step (cmsProbeTopK) AND its oracle —
        // referencing the same SQL keeps the twins provably identical
        "st6_stream_heavy_hitters" ->
          Analytics.oracles("q19_frequent_users"),
        // st8: chained stateful aggs emit only days finalized under the
        // final watermark (max(ts) − lateness); the oracle applies the
        // same cutoff — Spark evicts when window.end <= watermark
        "st8_stream_daily_rollup" ->
          """WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
             h AS (
               SELECT event_type, user_id, date_trunc('hour', ts) AS hr,
                 count(*) AS n
               FROM events GROUP BY 1, 2, 3),
             d AS (
               SELECT event_type, date_trunc('day', hr) AS day,
                 count(*) AS n_user_hours, CAST(sum(n) AS BIGINT) AS n_events
               FROM h GROUP BY 1, 2)
             SELECT d.event_type, d.day, d.n_user_hours, d.n_events
             FROM d, wm WHERE d.day + INTERVAL 1 DAY <= wm.w
             ORDER BY 1, 2""",
        // st9: LEFT OUTER stream-stream interval join. The sentinel
        // flush in the gate pushes the watermark past every real
        // error's matchable window, so unmatched rows all emit and the
        // oracle is the PLAIN batch left join — no finalization
        // cutoff. Nullable columns coalesced on both sides (dtype-
        // strict comparator; NULL BIGINTs degrade to float64 in the
        // DuckDB dataframe).
        "st9_stream_outer_join" ->
          """WITH e AS (SELECT event_id AS err_id, user_id,
                 epoch_us(ts) AS err_us
               FROM events WHERE event_type = 'error'),
             c AS (SELECT event_id AS click_id, user_id,
                 epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click')
             SELECT e.err_id,
               coalesce(c.click_id, -1) AS click_id,
               coalesce(c.click_us - e.err_us, 0) AS gap_us
             FROM e LEFT JOIN c ON e.user_id = c.user_id
               AND abs(c.click_us - e.err_us) <= CAST(1800 AS BIGINT) * 1000000
             ORDER BY 1, 2""",
        // st15: FULL OUTER twin of st9 — both unmatched sides emit on
        // eviction (sentinels flush both buffers), so the oracle is
        // the plain batch FULL JOIN, null sides coalesced as in st9
        "st15_stream_full_outer" ->
          """WITH e AS (SELECT event_id AS err_id, user_id,
                 epoch_us(ts) AS err_us
               FROM events WHERE event_type = 'error'),
             c AS (SELECT event_id AS click_id, user_id,
                 epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click')
             SELECT coalesce(e.err_id, -1) AS err_id,
               coalesce(c.click_id, -1) AS click_id,
               coalesce(c.click_us - e.err_us, 0) AS gap_us
             FROM e FULL JOIN c ON e.user_id = c.user_id
               AND abs(c.click_us - e.err_us) <= CAST(1800 AS BIGINT) * 1000000
             ORDER BY 1, 2""",
        // streaming funnel == batch funnel (tj3's own oracle verbatim)
        "st11_stream_funnel" -> EventOps.oracles("tj3_funnel"),
        // st12: LEFT SEMI stream-stream interval join — match-driven
        // emission (each matched error exactly once, no payload), so
        // the oracle is the plain batch EXISTS form
        "st12_stream_semi_join" ->
          """WITH e AS (SELECT event_id AS err_id, user_id,
                 epoch_us(ts) AS err_us
               FROM events WHERE event_type = 'error'),
             c AS (SELECT user_id, epoch_us(ts) AS click_us
               FROM events WHERE event_type = 'click')
             SELECT e.err_id, e.user_id
             FROM e WHERE EXISTS (
               SELECT 1 FROM c WHERE c.user_id = e.user_id
                 AND abs(c.click_us - e.err_us) <= CAST(1800 AS BIGINT) * 1000000)
             ORDER BY 1""",
        // st13: latest event per user — selection only (row_number
        // desc = 1 on the unique (ts, event_id) order), no arithmetic,
        // so every column is bit-identical
        "st13_stream_snapshot" ->
          """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
               event_type AS last_type, value AS last_value
             FROM (SELECT *, row_number() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
             WHERE rn = 1 ORDER BY user_id""",
        // the stream-static enrichment join vs its batch twin
        "st7_stream_enrich" ->
          """SELECT c.c_nationkey AS nation, date_trunc('hour', e.ts) AS hour,
               count(*) AS n_events, round(sum(e.value), 2) AS sum_value
             FROM events e JOIN customer c ON e.user_id = c.c_custkey
             GROUP BY 1, 2 ORDER BY 1, 2""")
}

package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream relational operators Spark has no built-in form for:
  * as-of join, interval (range) join, and semi-structured JSON
  * extraction. These are the batch twins of the streaming surface
  * ([[graft.streaming.EventStream]]) and the temporal complement of
  * the spatial ±2-day join (reference DS-JedAI configures temporal
  * windowing in `utils/configuration/Configuration.scala`; here the
  * window is on the event axis instead of a geometry pair).
  *
  * Scale notes (100 TB): both joins are single-shuffle-on-key plans.
  * The as-of join never builds per-row subqueries or range scans — it
  * is the union-and-scan form (one sort per user partition, running
  * `last(ignoreNulls)`), which is how a 1000-executor cluster does
  * point-in-time correctness joins over trillions of rows. The
  * interval join replicates the *probe* side to at most
  * ceil(len/bucket)+1 coarse time buckets (bounded, data-independent)
  * and equi-joins on (key, bucket) — never an unbounded theta-join.
  */
object EventOps {

  /** tj1: as-of join — for every `click` event, the most recent
    * `purchase` by the same user at-or-before the click.
    *
    * Plan shape: tag purchases side=0 and clicks side=1, union, then
    * one window per user ordered by (ts, side, event_id) carrying
    * `last(purchase_id, ignoreNulls)`. A purchase at the exact click
    * timestamp sorts first (side 0) and therefore matches ("at or
    * before"); ties among simultaneous purchases resolve to the max
    * event_id deterministically. One shuffle on user_id; rows stay
    * narrow (no payload replication). */
  def tj1AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("eid"), col("event_id").as("purch_id"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("double").as("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("eid"), lit(null).cast("long").as("purch_id"),
        col("event_id").as("click_id"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purch.unionByName(clicks)
      .withColumn("matched", last(col("purch_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"), col("value"),
        col("matched").as("purch_id"))
      .orderBy(col("click_id"))
  }

  private val HalfWindowUs = 1800L * 1000000L // ±30 min
  private val FunnelStepUs = 86400L * 1000000L // 24 h per funnel step

  /** tj2: interval (range) join — every (`error`, `click`) pair of the
    * same user within ±30 minutes.
    *
    * Scale shape: quantize time into half-window buckets; each error
    * probes buckets {b-1, b, b+1} (a row can only match within one
    * adjacent bucket of its own), clicks keep their single bucket, and
    * the join is a plain equi-join on (user_id, bucket) plus the exact
    * range predicate. Replication factor is a constant 3 regardless of
    * data volume — the standard bucketed-range-join decomposition —
    * and each true pair joins exactly once (the click's bucket is
    * unique), so no distinct pass is needed. */
  /** The (error, click) pairs within ±HalfWindowUs per user — tj2's
    * bucketed candidate generation (each error probes its bucket ± 1;
    * the equality key bounds the join, the range filter exacts it),
    * shared by tj2 (all pairs) and tj4 (nearest pair). */
  private def errorClickPairs(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def side(tpe: String, idName: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idName),
          unix_micros(col("ts")).as(s"${idName}_us"))
    val errors = side("error", "err_id")
      .withColumn("b0", (col("err_id_us") / HalfWindowUs).cast("long"))
      .select(col("user_id"), col("err_id"), col("err_id_us"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("jb"))
    val clicks = side("click", "click_id")
      .withColumn("jb", (col("click_id_us") / HalfWindowUs).cast("long"))
    errors.join(clicks, Seq("user_id", "jb"))
      .filter(abs(col("click_id_us") - col("err_id_us")) <= HalfWindowUs)
      .select(col("err_id"), col("click_id"),
        (col("click_id_us") - col("err_id_us")).as("gap_us"))
  }

  def tj2IntervalJoin(s: SparkSession, dir: String): DataFrame =
    errorClickPairs(s, dir).orderBy(col("err_id"), col("click_id"))

  /** tj4: NEAREST-event join — for every error, THE closest click by
    * |Δt| within the tolerance window (ties → smaller click_id),
    * errors with no candidate absent. The feature/label attachment
    * primitive of ML event pipelines (sensor reading ↔ nearest
    * calibration, impression ↔ nearest conversion): where tj1's as-of
    * looks only backward and tj2 keeps every pair, tj4 keeps the
    * argmin over both directions. Same bounded candidate generation
    * as tj2; the argmin is a window over the candidate list keyed by
    * err_id (cardinality grows with the corpus — never a low-NDV
    * partition). */
  def tj4NearestEvent(s: SparkSession, dir: String): DataFrame = {
    errorClickPairs(s, dir)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("err_id"))
          .orderBy(abs(col("gap_us")), col("click_id"))))
      .filter(col("rk") === 1)
      .select(col("err_id"), col("click_id"), col("gap_us"))
      .orderBy(col("err_id"))
  }

  /** tj3: ordered event funnel — completed view → click → purchase
    * chains per user, each step at most 24 hours after the previous
    * (this corpus's event density makes sub-hour chains vacuous; the
    * window is a parameter in spirit — the plan is identical at any
    * width).
    * The sessionization-adjacent operator every product-analytics /
    * training-signal pipeline needs.
    *
    * Plan shape: two chained as-of passes in the tj1 union-and-scan
    * form — pass 1 stamps every click with its most recent view
    * (window carry of `last(ignoreNulls)`), pass 2 stamps every
    * purchase with its most recent QUALIFIED click (one that completed
    * step 1), carrying the click's view id along. Both windows
    * partition on user_id with compatible ordering, so Catalyst reuses
    * ONE exchange+sort per pass over narrow rows — never a per-step
    * theta-join. */
  def tj3Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    def side(tpe: String, sd: Int) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(sd).as("side"), col("event_id").as("eid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("side"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p1 = side("view", 0).unionByName(side("click", 1))
      .withColumn("v_eid",
        last(when(col("side") === 0, col("eid")), ignoreNulls = true).over(w))
      .withColumn("v_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
    val qualifiedClicks = p1
      .filter(col("side") === 1 && col("v_us").isNotNull &&
        col("us") - col("v_us") <= FunnelStepUs)
      .select(col("user_id"), col("us"), lit(0).as("side"), col("eid"),
        col("v_eid"), col("v_us"))
    val purchases = side("purchase", 1)
      .withColumn("v_eid", lit(null).cast("long"))
      .withColumn("v_us", lit(null).cast("long"))
    qualifiedClicks.unionByName(purchases)
      .withColumn("c_eid",
        last(when(col("side") === 0, col("eid")), ignoreNulls = true).over(w))
      .withColumn("c_us",
        last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
      .withColumn("cv_eid",
        last(when(col("side") === 0, col("v_eid")), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("c_us").isNotNull &&
        col("us") - col("c_us") <= FunnelStepUs)
      .select(col("eid").as("purch_id"), col("user_id"),
        col("us").as("purch_us"), col("c_eid").as("click_id"),
        col("cv_eid").as("view_id"))
      .orderBy(col("purch_id"))
  }

  /** se1: semi-structured extraction — parse the `props` JSON column
    * (codegen'd `get_json_object`, no UDF) and aggregate the extracted
    * field per event type. The 100 TB story: JSON stays schemaless in
    * storage; extraction is a map-side projection feeding a partial
    * hash aggregate — no shuffle beyond the 5-group final agg. */
  def se1JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** se2: typed schema-on-read — `from_json` with an EXPLICIT schema
    * (nested struct + array) over a derived semi-structured payload
    * with deliberately corrupt rows (event_id % 13 — the
    * corpus-is-fake/plumbing-is-real pattern). Where se1's
    * get_json_object pulls one path per call, this is the production
    * shape: one typed parse per row (Jackson, schema-pruned), nested
    * field access as struct columns afterwards, and PERMISSIVE
    * corrupt handling surfaced as an accounted metric (a silent-drop
    * parse is how bad rows vanish unnoticed at 100 TB). Pure map +
    * one aggregation — scan-bound at any scale. */
  def se2SchemaOnRead(s: SparkSession, dir: String): DataFrame = {
    val eid = col("event_id")
    val j = when(eid % 13 === 0, lit("{broken"))
      .otherwise(concat(
        lit("{\"k\": "), get_json_object(col("props"), "$.k"),
        lit(", \"meta\": {\"src\": \""), col("event_type"),
        lit("\", \"n\": "), (eid % 7).cast("string"),
        lit("}, \"tags\": ["), (eid % 3).cast("string"),
        lit(", "), (eid % 5).cast("string"), lit("]}")))
    val schema =
      "k BIGINT, meta STRUCT<src: STRING, n: BIGINT>, tags ARRAY<BIGINT>"
    events(s, dir)
      .select(col("event_type"),
        from_json(j, org.apache.spark.sql.types.StructType.fromDDL(schema))
          .as("p"))
      .groupBy(col("event_type"))
      .agg(
        count(col("p.k")).as("n_valid"),
        (count(lit(1)) - count(col("p.k"))).as("n_corrupt"),
        sum(col("p.k")).as("sum_k"),
        sum(col("p.meta.n")).as("sum_meta_n"),
        sum(element_at(col("p.tags"), 1) + element_at(col("p.tags"), 2))
          .as("sum_tags"))
      .orderBy(col("event_type"))
  }

  /** se3: CSV SCHEMA-ON-READ — the delimited twin of se2: a raw CSV
    * line per event (every 13th synthesized corrupt: wrong arity AND a
    * non-numeric leading field) parsed through `from_csv` in
    * PERMISSIVE mode against a typed schema, then aggregated with
    * corrupt-row accounting. A 100 TB lake's landing zone is mostly
    * delimited text; this gates that the typed-projection path counts
    * and excludes malformed lines instead of failing the job or
    * silently coercing. The synthesized line derives every field from
    * event columns, so the oracle recomputes the aggregates exactly
    * from the same arithmetic. Plan: per-row parse + one key agg —
    * scan-linear, no extra shuffle. */
  def se3CsvParse(s: SparkSession, dir: String): DataFrame = {
    val eid = col("event_id")
    val line = when(eid % 13 === 0,
      concat(lit("x"), eid.cast("string"), lit(",oops")))
      .otherwise(concat(
        (eid % 7).cast("string"), lit(","),
        col("event_type"), lit(","),
        (eid % 100).cast("string")))
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("a BIGINT, b STRING, c BIGINT")
    events(s, dir)
      .select(col("event_type"),
        from_csv(line, schema, Map.empty[String, String]).as("p"))
      .groupBy(col("event_type"))
      .agg(
        count(col("p.a")).as("n_valid"),
        (count(lit(1)) - count(col("p.a"))).as("n_corrupt"),
        sum(col("p.a")).as("sum_a"),
        sum(col("p.c")).as("sum_c"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "se3_csv_parse" -> (se3CsvParse _),
    "tj1_asof_join" -> (tj1AsofJoin _),
    "tj2_interval_join" -> (tj2IntervalJoin _),
    "tj4_nearest_event" -> (tj4NearestEvent _),
    "tj3_funnel" -> (tj3Funnel _),
    "se1_json_extract" -> (se1JsonExtract _),
    "se2_schema_on_read" -> (se2SchemaOnRead _)
  )

  val oracles: Map[String, String] = Map(
    // se3: the synthesized line's fields are pure functions of event
    // columns, so the aggregates recompute exactly; the %13 corrupt
    // rows contribute only to n_corrupt
    "se3_csv_parse" ->
      """SELECT event_type,
           count(CASE WHEN event_id % 13 <> 0 THEN 1 END) AS n_valid,
           count(CASE WHEN event_id % 13 = 0 THEN 1 END) AS n_corrupt,
           CAST(sum(CASE WHEN event_id % 13 <> 0 THEN event_id % 7 END)
             AS BIGINT) AS sum_a,
           CAST(sum(CASE WHEN event_id % 13 <> 0 THEN event_id % 100 END)
             AS BIGINT) AS sum_c
         FROM events GROUP BY 1 ORDER BY 1""",
    // Window-union form mirrors the distributed plan; correlated
    // subqueries would be O(n) scans per click in any engine.
    "tj1_asof_join" ->
      """WITH u AS (
           SELECT user_id, ts, 0 AS side, event_id AS eid,
                  event_id AS purch_id, NULL::BIGINT AS click_id,
                  NULL::DOUBLE AS value
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, 1, event_id, NULL, event_id, value
           FROM events WHERE event_type = 'click'),
         m AS (
           SELECT *, last_value(purch_id IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, side, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
           FROM u)
         SELECT click_id, user_id, epoch_us(ts) AS click_us, value,
                matched AS purch_id
         FROM m WHERE side = 1 ORDER BY click_id""",
    "tj2_interval_join" ->
      """WITH e AS (
           SELECT event_id AS err_id, user_id, epoch_us(ts) AS err_id_us
           FROM events WHERE event_type = 'error'),
         c AS (
           SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_id_us
           FROM events WHERE event_type = 'click')
         SELECT e.err_id, c.click_id,
                c.click_id_us - e.err_id_us AS gap_us
         FROM e JOIN c ON e.user_id = c.user_id
           AND abs(c.click_id_us - e.err_id_us) <= CAST(1800 AS BIGINT) * 1000000
         ORDER BY e.err_id, c.click_id""",
    // tj4: tj2's pair space reduced to the per-error argmin by
    // (|gap|, click_id) — exact integer ordering, no arithmetic drift
    "tj4_nearest_event" ->
      """WITH e AS (
           SELECT event_id AS err_id, user_id, epoch_us(ts) AS err_us
           FROM events WHERE event_type = 'error'),
         c AS (
           SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_us
           FROM events WHERE event_type = 'click'),
         cand AS (
           SELECT e.err_id, c.click_id, c.click_us - e.err_us AS gap_us
           FROM e JOIN c ON e.user_id = c.user_id
             AND abs(c.click_us - e.err_us) <= CAST(1800 AS BIGINT) * 1000000),
         ranked AS (
           SELECT err_id, click_id, gap_us,
             row_number() OVER (PARTITION BY err_id
               ORDER BY abs(gap_us), click_id) AS rk
           FROM cand)
         SELECT err_id, click_id, gap_us FROM ranked WHERE rk = 1
         ORDER BY err_id""",
    "tj3_funnel" ->
      """WITH s1 AS (
           SELECT user_id, epoch_us(ts) AS us, 0 AS side, event_id AS eid
           FROM events WHERE event_type = 'view'
           UNION ALL
           SELECT user_id, epoch_us(ts), 1, event_id
           FROM events WHERE event_type = 'click'),
         m1 AS (
           SELECT *,
             last_value(CASE WHEN side = 0 THEN eid END IGNORE NULLS)
               OVER w AS v_eid,
             last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS)
               OVER w AS v_us
           FROM s1
           WINDOW w AS (PARTITION BY user_id ORDER BY us, side, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         qc AS (
           SELECT user_id, us, 0 AS side, eid, v_eid, v_us
           FROM m1 WHERE side = 1 AND v_us IS NOT NULL
             AND us - v_us <= CAST(86400 AS BIGINT) * 1000000),
         s2 AS (
           SELECT * FROM qc
           UNION ALL
           SELECT user_id, epoch_us(ts), 1, event_id,
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
           FROM events WHERE event_type = 'purchase'),
         m2 AS (
           SELECT *,
             last_value(CASE WHEN side = 0 THEN eid END IGNORE NULLS)
               OVER w AS c_eid,
             last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS)
               OVER w AS c_us,
             last_value(CASE WHEN side = 0 THEN v_eid END IGNORE NULLS)
               OVER w AS cv_eid
           FROM s2
           WINDOW w AS (PARTITION BY user_id ORDER BY us, side, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT eid AS purch_id, user_id, us AS purch_us,
           c_eid AS click_id, cv_eid AS view_id
         FROM m2
         WHERE side = 1 AND c_us IS NOT NULL
           AND us - c_us <= CAST(86400 AS BIGINT) * 1000000
         ORDER BY purch_id""",
    "se1_json_extract" ->
      """SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    // se2: the same derived payload rebuilt in SQL, parsed with
    // json_valid gating the corrupt rows (DuckDB's twin of PERMISSIVE
    // null-struct), nested paths and array elements extracted typed
    "se2_schema_on_read" ->
      """WITH raw AS (
           SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN '{broken'
             ELSE '{"k": ' || json_extract_string(props, '$.k')
               || ', "meta": {"src": "' || event_type || '", "n": '
               || CAST(event_id % 7 AS VARCHAR)
               || '}, "tags": [' || CAST(event_id % 3 AS VARCHAR)
               || ', ' || CAST(event_id % 5 AS VARCHAR) || ']}'
             END AS j
           FROM events),
         parsed AS (
           SELECT event_type,
             CASE WHEN json_valid(j)
               THEN CAST(json_extract(j, '$.k') AS BIGINT) END AS k,
             CASE WHEN json_valid(j)
               THEN CAST(json_extract(j, '$.meta.n') AS BIGINT) END AS mn,
             CASE WHEN json_valid(j)
               THEN CAST(json_extract(j, '$.tags[0]') AS BIGINT)
                  + CAST(json_extract(j, '$.tags[1]') AS BIGINT) END AS tsum
           FROM raw)
         SELECT event_type, count(k) AS n_valid,
           count(*) - count(k) AS n_corrupt,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(sum(mn) AS BIGINT) AS sum_meta_n,
           CAST(sum(tsum) AS BIGINT) AS sum_tags
         FROM parsed GROUP BY 1 ORDER BY 1"""
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeomFunctions._

/** Spark-native holistic spatial interlinking — the capability of
  * DS-JedAI's GIA.nt batch algorithm (`linkers/GIAnt.scala`,
  * `linkers/DistributedInterlinking.scala`) re-expressed as a
  * declarative DataFrame plan:
  *
  *   1. θ ("dynamic tiling") — one aggregate over the SOURCE envelopes
  *      (reference: `model/TileGranularities.scala:33-36`, AVG policy).
  *   2. Tile cover — each geometry's MBR exploded to the θ-grid tiles it
  *      overlaps (`explode(tile_cover(...))`); the tile id is a single
  *      long, so the shuffle key is cheap and dense.
  *   3. Candidate generation — plain equi-join on the tile id. Catalyst
  *      picks broadcast vs shuffled-hash vs sort-merge from sizes, and
  *      AQE handles byte-skew at runtime; no hand-built per-partition
  *      index needed (reference: `model/structures/SpatialIndex.scala`).
  *   4. MBR intersection filter (`LinkerT.scala:52-55`).
  *   5. Reference-point dedup: keep the pair only in the tile containing
  *      the top-left corner of the MBR intersection — replicated pairs
  *      survive exactly once WITHOUT any dropDuplicates shuffle
  *      (reference: `linkers/LinkerT.scala:30-41`).
  *   6. Verification — a single JTS relate per surviving pair via the
  *      `st_im` expression (DE-9IM) or `st_predicate` (single relation).
  *
  * Scale: both sides shuffle once on the tile id; everything after is
  * pipelined map-side. Verification cost is proportional to surviving
  * candidates, not input size. For a 100 TB run, tune θ (bigger tiles →
  * fewer replicas, more candidates per tile) and rely on AQE skew-join
  * splitting for dense tiles.
  */
object SpatialJoin {

  case class Theta(x: Double, y: Double)

  /** Standard geometry-relation schema: id, geom (WKB), minx..maxy.
    * The parse is wrapped in an optimizer barrier so it is evaluated
    * exactly once per row (see [[graft.functions.ExprBarrier]]). */
  def entities(df: DataFrame, id: Column, wkt: Column,
               extra: (String, Column)*): DataFrame =
    df.select(id.cast("string").as("id") +: barrier(st_geomfromwkt(wkt)).as("geom") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .filter(col("geom").isNotNull)
      .withColumn("env", barrier(st_envelope(col("geom"))))
      .select(col("id") +: col("geom") +:
        col("env.minx").as("minx") +: col("env.miny").as("miny") +:
        col("env.maxx").as("maxx") +: col("env.maxy").as("maxy") +:
        extra.map { case (n, _) => col(n) }: _*)

  /** [[entities]] over parquet-native WKB geometry bytes
    * ([[graft.functions.StGeomFromWkb]]) — production geospatial
    * tables carry WKB binary columns, not WKT text; this keeps the
    * scan binary end to end (no text parse) while applying the same
    * validity filter and canonical normalization. */
  def entitiesFromWkb(df: DataFrame, id: Column, wkb: Column,
                      extra: (String, Column)*): DataFrame =
    df.select(id.cast("string").as("id") +:
        // qualified: Spark 4.1's own functions._ also exports an
        // st_geomfromwkb (its geospatial preview surface)
        barrier(graft.functions.GeomFunctions.st_geomfromwkb(wkb)).as("geom") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .filter(col("geom").isNotNull)
      .withColumn("env", barrier(st_envelope(col("geom"))))
      .select(col("id") +: col("geom") +:
        col("env.minx").as("minx") +: col("env.miny").as("miny") +:
        col("env.maxx").as("maxx") +: col("env.maxy").as("maxy") +:
        extra.map { case (n, _) => col(n) }: _*)

  /** θ = SOURCE envelope extent statistic per axis (zero-extent
    * inputs — points / axis-parallel lines — fall back to 1.0,
    * mirroring the reference's guard for degenerate extents,
    * `model/TileGranularities.scala:24-27`). One Spark job, tiny
    * result collected to the driver and baked into the plan as
    * literals.
    *
    * `granularity` selects the reference's tile-granularity statistic
    * (`model/TileGranularities.scala:22-45`,
    * `utils/configuration/Constants.scala:39-48`):
    *  - `avg` (default, the reference's recommended setting): mean of
    *    the non-degenerate extents;
    *  - `avg2`: half the avg — tiles twice as fine;
    *  - `min`: smallest non-zero extent (the reference filters zero
    *    extents here for exactly the perpendicular-geometry reason);
    *  - `max`: largest extent;
    *  - `none`: no dynamic tiling — θ = (1, 1).
    * The verified pair set is θ-invariant (tiling only changes
    * candidate replication; reference-point dedup removes duplicates),
    * so granularity is a performance dial, never a semantics dial —
    * ConfigRunnerSpec asserts result equality across all five. */
  def computeTheta(source: DataFrame): Theta = computeTheta(source, "avg")

  def computeTheta(source: DataFrame, granularity: String): Theta = {
    val ex = col("maxx") - col("minx")
    val ey = col("maxy") - col("miny")
    val (ax, ay) = granularity.toLowerCase match {
      case "avg" | "avg2" =>
        (avg(when(ex > 0, ex)), avg(when(ey > 0, ey)))
      case "min" =>
        (min(when(ex > 0, ex)), min(when(ey > 0, ey)))
      // max must keep the same zero-extent guard as the others: over a
      // point-only axis max(ex) is 0.0 (not NULL), and an unguarded
      // 0.0 would clamp to the 1e-9 floor — exploding every MBR into
      // ~extent/1e-9 tiles instead of falling back to θ = 1.0
      case "max" => (max(when(ex > 0, ex)), max(when(ey > 0, ey)))
      case "none" => return Theta(1.0, 1.0)
      case other => throw new IllegalArgumentException(
        s"unknown thetaGranularity '$other' (avg | avg2 | min | max | none)")
    }
    val row = source.agg(ax.as("tx"), ay.as("ty")).head()
    val half = if (granularity.equalsIgnoreCase("avg2")) 0.5 else 1.0
    val tx = if (row.isNullAt(0)) 1.0 else math.max(half * row.getDouble(0), 1e-9)
    val ty = if (row.isNullAt(1)) 1.0 else math.max(half * row.getDouble(1), 1e-9)
    Theta(tx, ty)
  }

  private def prefixed(df: DataFrame, p: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))

  /** Narrow candidate pairs: tile join + MBR filter + reference-point
    * dedup over every entity column EXCEPT the geometry blob. Output:
    * s_* and t_* columns (no s_geom/t_geom), one row per pair.
    *
    * The tile explode replicates each row once per covered θ-tile —
    * replicating the WKB blob there multiplies shuffle volume by the
    * tile count (ruinous for large geometries) and lets Catalyst
    * broadcast a deceptively "small" pre-explode side that is huge
    * after the generate. Narrow rows (~50 B) keep the replication
    * harmless; [[candidatePairs]] joins the blobs back per surviving
    * pair, which is one hash join per side against the entity frames
    * (persist them when parsing is expensive — the gate queries do). */
  def candidatePairsNarrow(source: DataFrame, target: DataFrame,
                           theta: Theta): DataFrame = {
    val s = tiled(source, "s_", theta)
    val t = tiled(target, "t_", theta)
    pairJoinTail(s, t, theta)
  }

  private def tiled(side: DataFrame, p: String, theta: Theta): DataFrame =
    prefixed(side.drop("geom"), p).withColumn("tile",
      explode(tile_cover(col(p + "minx"), col(p + "miny"),
        col(p + "maxx"), col(p + "maxy"), theta.x, theta.y)))

  private def pairJoinTail(s: DataFrame, t: DataFrame, theta: Theta): DataFrame = {
    val mbrIntersects =
      col("s_minx") <= col("t_maxx") && col("s_maxx") >= col("t_minx") &&
      col("s_miny") <= col("t_maxy") && col("s_maxy") >= col("t_miny")
    // Reference point = top-left corner of the MBR intersection; its
    // tile is computed with the same floor(c/θ) as tile_cover, so the
    // pair passes in exactly one of its common tiles.
    val refTx = floor(greatest(col("s_minx"), col("t_minx")) / theta.x).cast("long")
    val refTy = floor(greatest(col("s_miny"), col("t_miny")) / theta.y).cast("long")
    val refTile = shiftleft(refTx, 32).bitwiseOR(refTy.bitwiseAND(lit(0xFFFFFFFFL)))
    s.join(t, "tile")
      .filter(mbrIntersects && col("tile") === refTile)
      .drop("tile")
  }

  /** [[candidatePairsNarrow]] with a tile-key runtime filter — q20's
    * bloom composed into the spatial exchange (round-8 verdict item):
    * when the SOURCE is much smaller than the target but too large (or
    * too blob-heavy) to broadcast, build a
    * [[graft.functions.BloomFunctions]] membership sketch over the
    * source's OCCUPIED θ-tile keys (one small-side aggregation job,
    * O(bits) result shipped as a plan constant) and prune the target's
    * exploded tile rows BEFORE their exchange: a tile no source row
    * covers cannot produce a candidate pair, so (1 − source tile
    * occupancy) of the big side's post-explode shuffle volume never
    * moves. False positives (fpp 1 %) only re-admit rows the tile
    * equi-join drops anyway — the pair set is EXACTLY
    * [[candidatePairsNarrow]]'s (spec-asserted pair-for-pair, and sp17
    * hash-gates the composed join; the exchange cut is asserted from
    * the executed plan's SQL metrics like q20's). */
  def candidatePairsNarrowPruned(source: DataFrame, target: DataFrame,
                                 theta: Theta): DataFrame = {
    import graft.functions.BloomFunctions
    val s = tiled(source, "s_", theta)
    // expectedItems sizes the bloom: source rows × the 3×3-ish tile
    // cover a θ-scaled envelope typically spans, from the CHEAP
    // un-exploded count (column-pruned scan / metadata) — counting the
    // exploded tiling would run the explode a third time for a number
    // whose only job is bit-sizing, and overestimating merely widens
    // the filter. The tiled source is still computed twice (the bloom
    // build aggregation and the pair join) — both are necessary scans.
    val bits = BloomFunctions.buildLongFilter(s.select(col("tile")), "tile",
      source.count() * 9, 0.01)
    val t = tiled(target, "t_", theta)
      .filter(BloomFunctions.mightContainLong(col("tile"), bits))
    pairJoinTail(s, t, theta)
  }

  /** [[relate]] over the tile-bloom-pruned candidate path — the
    * asymmetric big×big spatial join shape (see
    * [[candidatePairsNarrowPruned]]). */
  def relateBloomPruned(source: DataFrame, target: DataFrame,
                        relation: String): DataFrame = {
    val theta = computeTheta(source)
    candidatePairsNarrowPruned(source, target, theta)
      .join(source.select(col("id").as("s_id"), col("geom").as("s_geom")), "s_id")
      .join(target.select(col("id").as("t_id"), col("geom").as("t_geom")), "t_id")
      .filter(st_predicate(col("s_geom"), col("t_geom"), relation))
      .select(col("s_id"), col("t_id"))
  }

  /** Candidate pairs after tile join + MBR filter + reference-point
    * dedup. Output: s_* and t_* columns, one row per qualifying pair.
    * Entity ids must be unique per side (the engine-wide contract,
    * like the reference's originalID).
    *
    * `spreadVerify` (round 16, replacing r15's unconditional count-less
    * repartition): when the caller's downstream verification is
    * compute-dense (~ms of JTS per pair — the forced segmented-IM
    * path), the NARROW pair frame is hash-spread on s_id over an
    * EXPLICIT defaultParallelism partition count before the blob
    * joins. Explicit because the r15 count-less form was
    * REPARTITION_BY_COL, which AQE coalesces by BYTES — ~50 B/pair
    * kept the whole exchange under one 64 KiB floor partition, so the
    * committed r15 bench still ran sp10's verification serially
    * (executed plan: `AQEShuffleRead coalesced` to 1, 9 single-task
    * stages, 4.3 s; 1.0 s spread). A user-specified count is exempt
    * from AQE coalescing by contract, and it derives from cluster
    * cores, not a constant: rows are narrow, so even billions of pairs
    * over total-cores partitions stay ~100 MB-sized, and a production
    * sort-merge blob join REUSES the s_id hash partitioning. Default
    * OFF because cheap-verification consumers measurably pay for the
    * extra exchange + task count (paired A/B at sf0.1: sp11 1.26 →
    * 1.61, sp12 1.39 → 1.84, sp4 0.36 → 0.63 with the spread forced
    * on them, while sp10 goes 3.75 → 1.04 with it). */
  def candidatePairs(source: DataFrame, target: DataFrame, theta: Theta,
                     spreadVerify: Boolean = false): DataFrame = {
    val narrow = candidatePairsNarrow(source, target, theta)
    val spread =
      if (spreadVerify)
        narrow.repartition(
          source.sparkSession.sparkContext.defaultParallelism, col("s_id"))
      else narrow
    spread
      .join(source.select(col("id").as("s_id"), col("geom").as("s_geom")), "s_id")
      .join(target.select(col("id").as("t_id"), col("geom").as("t_geom")), "t_id")
  }

  /** Holistic DE-9IM: verify every candidate pair once; emit ids, the
    * DE-9IM string, and the ten relation booleans. Matches GIA.nt
    * semantics: only MBR-intersecting pairs are verified
    * (`linkers/GIAnt.scala:32-37`).
    *
    * Verification is ADAPTIVE by default (identical results, spec-
    * asserted): analytic interval IM for rectangle pairs, exact
    * segmented IM above the point cutoff, plain JTS relate otherwise —
    * rectangle-heavy workloads skip JTS entirely. */
  def de9im(source: DataFrame, target: DataFrame, theta: Theta,
            spreadVerify: Boolean = false): DataFrame =
    candidatePairs(source, target, theta, spreadVerify = spreadVerify)
      .withColumn("im", st_im_adaptive(col("s_geom"), col("t_geom"),
        theta.x, theta.y))
      .select(col("s_id"), col("t_id"), col("im.*"))

  def de9im(source: DataFrame, target: DataFrame): DataFrame =
    de9im(source, target, computeTheta(source))

  def de9im(source: DataFrame, target: DataFrame,
            spreadVerify: Boolean): DataFrame =
    de9im(source, target, computeTheta(source), spreadVerify = spreadVerify)

  def de9im(source: DataFrame, target: DataFrame,
            granularity: String): DataFrame =
    de9im(source, target, computeTheta(source, granularity))

  /** DE-9IM with adaptive verification: analytic IM for rectangles,
    * exact segmented IM for large polygon pairs (interaction-
    * neighbourhood cost), plain relate otherwise. Results identical to
    * [[de9im]]; use when operand size varies wildly.
    *
    * `earlyExit = true` switches the segmented branch to the
    * reference's RANK-ordered early-exit accumulation (J8,
    * `IndexedDecomposedEntity.scala:36-96`) — on that path only the
    * intersects decision is contractual (partial accumulation may
    * under-set exterior entries), so it is opt-in and default-off;
    * the exact union form stays the default. */
  def de9imAdaptive(source: DataFrame, target: DataFrame,
                    minPoints: Int = 64,
                    earlyExit: Boolean = false,
                    spreadVerify: Boolean = false): DataFrame = {
    val theta = computeTheta(source)
    candidatePairs(source, target, theta, spreadVerify = spreadVerify)
      .withColumn("im", st_im_adaptive(col("s_geom"), col("t_geom"),
        theta.x, theta.y, minPoints, earlyExit))
      .select(col("s_id"), col("t_id"), col("im.*"))
  }

  /** Single-relation spatial join (DS-JedAI `SpatialJoinExp`): emit
    * qualifying (s_id, t_id) pairs only. */
  def relate(source: DataFrame, target: DataFrame, relation: String,
             granularity: String = "avg"): DataFrame = {
    val theta = computeTheta(source, granularity)
    candidatePairs(source, target, theta)
      .filter(st_predicate(col("s_geom"), col("t_geom"), relation))
      .select(col("s_id"), col("t_id"))
  }

  /** Overlay MEASURE aggregation: per target entity, the number of
    * intersecting source entities and the TOTAL intersection area —
    * "how much of each zone is covered", the quantitative question the
    * boolean join family (relate/de9im) cannot answer. Runs the same
    * θ-tile candidate pipeline, then one JTS set-intersection per
    * verified pair ([[graft.functions.StIntersectionArea]]) feeding a
    * plain partial-aggregated sum on the target key — per-pair work
    * stays where the pair is, only (t_id, area) rows shuffle.
    *
    * `integerAreas = true` asserts the corpus contract that every
    * per-pair area is an exact integer (integer-coordinate rectangle
    * operands): areas then sum as longs, which makes the distributed
    * aggregation order-free and therefore bit-exact against any
    * engine — a double sum would be partition-order dependent. The
    * general-geometry path (false) sums doubles and is exact only up
    * to summation order. */
  def overlayArea(source: DataFrame, target: DataFrame,
                  granularity: String = "avg",
                  integerAreas: Boolean = false): DataFrame = {
    val theta = computeTheta(source, granularity)
    val perPair = candidatePairs(source, target, theta)
      .filter(st_predicate(col("s_geom"), col("t_geom"), "intersects"))
      .select(col("t_id"),
        st_intersection_area(col("s_geom"), col("t_geom")).as("area"))
    val total =
      if (integerAreas) sum(col("area").cast("long"))
      else sum(col("area"))
    perPair.groupBy(col("t_id"))
      .agg(count(lit(1)).as("n_pairs"), total.as("overlap_area"))
  }

  /** DE-9IM with the fine-grained-envelope candidate filter (reference
    * FINEGRAINED_ENVELOPES approximation): pairs additionally need at
    * least one intersecting sub-envelope pair. Strictly fewer
    * verifications than the MBR path; every non-disjoint pair is
    * preserved (sub-envelopes cover the geometry). */
  def de9imFineGrained(source: DataFrame, target: DataFrame,
                       maxEnvs: Int = 16,
                       granularity: String = "avg",
                       spreadVerify: Boolean = false): DataFrame = {
    val theta = computeTheta(source, granularity)
    val s = source.withColumn("envs",
      barrier(st_fine_envelopes(col("geom"), theta.x, maxEnvs)))
    val t = target.withColumn("envs",
      barrier(st_fine_envelopes(col("geom"), theta.x, maxEnvs)))
    val anySubEnvIntersects = exists(col("s_envs"), se =>
      exists(col("t_envs"), te =>
        se.getField("minx") <= te.getField("maxx") &&
        se.getField("maxx") >= te.getField("minx") &&
        se.getField("miny") <= te.getField("maxy") &&
        se.getField("maxy") >= te.getField("miny")))
    candidatePairs(s, t, theta, spreadVerify = spreadVerify)
      .filter(anySubEnvIntersects)
      .withColumn("im", st_im(col("s_geom"), col("t_geom")))
      .select(col("s_id"), col("t_id"), col("im.*"))
  }

  /** Segmented single-relation join for `intersects` (reference J8
    * segmented verification, exact for intersection): decompose both
    * sides along the θ-grid, join per-tile segments, verify the small
    * segments instead of whole geometries — the win is on huge
    * geometries where whole-geometry JTS evaluation dominates.
    * intersects(A,B) <=> some co-tiled segment pair intersects.
    *
    * The per-side decomposition (st_grid_segments explode) is session-
    * cached like the entity frames, keyed by a 128-bit md5 of the input
    * plan's CANONICALIZED string *combined with* `semanticHash()` + θ.
    * Neither alone suffices: the 32-bit semanticHash has real
    * birthday-collision odds across a long session, while the
    * canonicalized STRING of a LocalRelation omits its rows (two
    * in-memory corpora with the same schema print identically). A
    * collision now needs both to match at once. Callers with a natural
    * corpus identity (a source dir) can pass `corpusKey` to make the
    * key self-describing, as the other DfCache.memo sites do.
    * Decompose-cost dominates this join, and repeated invocations over
    * the same corpus (warm bench runs, multi-query sessions) would
    * otherwise re-segment both sides every time. */
  def relateSegmented(source: DataFrame, target: DataFrame,
                      corpusKey: String = "",
                      granularity: String = "avg"): DataFrame = {
    val theta = computeTheta(source, granularity)
    def planFp(df: DataFrame): String = {
      val canon = df.queryExecution.analyzed.canonicalized.toString +
        "#" + df.semanticHash()
      java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def segmentSide(df: DataFrame, p: String): DataFrame =
      graft.spark.DfCache.memo(df.sparkSession,
        s"segments#$corpusKey#${planFp(df)}#${theta.x}x${theta.y}") {
        df.select(col("id"),
            explode(barrier(st_grid_segments(col("geom"), theta.x, theta.y))).as("sg"))
          .select(col("id"), col("sg.tile").as("tile"), col("sg.seg").as("seg"))
      }.select(col("id").as(s"${p}id"), col("tile"), col("seg").as(s"${p}seg"))
    segmentSide(source, "s_").join(segmentSide(target, "t_"), "tile")
      .filter(st_predicate(col("s_seg"), col("t_seg"), "intersects"))
      .select(col("s_id"), col("t_id"))
      .distinct()
  }

  /** Count candidate pairs without verifying (reference J9). A count
    * needs no geometry, so this goes through the narrow pair frame —
    * no WKB join-backs in the plan. */
  def countVerifications(source: DataFrame, target: DataFrame,
                         granularity: String = "avg"): Long = {
    val theta = computeTheta(source, granularity)
    candidatePairsNarrow(source, target, theta).count()
  }

  /** Per-partition A6 diagnostics row (reference `executionStats`,
    * `DistributedInterlinking.scala:121-155`: pid, verifications,
    * heaviest geometry, wall time per partition). `maxGeomBytes`
    * stands in for the reference's max point count — WKB size is
    * proportional to it (16 B/vertex) and needs no parse. */
  case class PartitionStats(verifications: Long, wallMillis: Double,
                            maxGeomBytes: Int)

  /** Per-partition verification diagnostics (reference A6): run the
    * DE-9IM join while recording, per Spark partition, the
    * verification count, the wall-clock time from first candidate to
    * exhaustion (the verification loop is pipelined behind this
    * iterator, so elapsed ≈ the partition's verify time — the
    * reference brackets its GIAnt loop the same way), and the largest
    * geometry blob. Exposes verification-cost skew that byte metrics
    * miss. */
  def de9imWithStats(source: DataFrame,
                     target: DataFrame): (DataFrame, Map[Int, PartitionStats]) = {
    val theta = computeTheta(source)
    val acc = source.sparkSession.sparkContext
      .collectionAccumulator[(Int, Long, Double, Int)]("graft.partitionStats")
    val cands = candidatePairs(source, target, theta)
    val spark = cands.sparkSession
    val counted = cands.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val t0 = System.nanoTime()
      new Iterator[org.apache.spark.sql.Row] {
        private var n = 0L
        private var maxB = 0
        private var si = -1
        private var ti = -1
        private var flushed = false
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && !flushed) {
            acc.add((pid, n, (System.nanoTime() - t0) / 1e6, maxB))
            flushed = true
          }
          h
        }
        def next(): org.apache.spark.sql.Row = {
          val r = it.next()
          if (si < 0) { si = r.fieldIndex("s_geom"); ti = r.fieldIndex("t_geom") }
          maxB = math.max(maxB, math.max(
            r.getAs[Array[Byte]](si).length, r.getAs[Array[Byte]](ti).length))
          n += 1
          r
        }
      }
    }(org.apache.spark.sql.Encoders.row(cands.schema))
    val result = counted
      .withColumn("im", st_im(col("s_geom"), col("t_geom")))
      .select(col("s_id"), col("t_id"), col("im.*"))
    result.count() // materialize so the accumulator is populated
    import scala.jdk.CollectionConverters._
    val stats = acc.value.asScala.groupBy(_._1).view.mapValues { rows =>
      PartitionStats(rows.map(_._2).sum, rows.map(_._3).max, rows.map(_._4).max)
    }.toMap
    (result, stats)
  }

  /** Spatio-temporal single-relation join — the reference's
    * SpatioTemporalEntity semantics (DS-JedAI
    * `model/entities/SpatioTemporalEntity.scala:18-28`): a pair
    * qualifies only when the dates are within `maxDays` days
    * (exclusive) AND the spatial relation holds. Both entity inputs
    * must carry a `ts` date column (via `entities(.., "ts" -> col)`).
    * The temporal predicate is applied BEFORE verification, like the
    * reference's approximateIntersection composition — a band/as-of
    * join in relational terms. */
  def temporalRelate(source: DataFrame, target: DataFrame, relation: String,
                     maxDays: Int = 2,
                     granularity: String = "avg"): DataFrame = {
    val theta = computeTheta(source, granularity)
    candidatePairs(source, target, theta)
      .filter(abs(datediff(col("s_ts"), col("t_ts"))) < maxDays)
      .filter(st_predicate(col("s_geom"), col("t_geom"), relation))
      .select(col("s_id"), col("t_id"))
  }

  /** The reference's headline output: total verifications, qualifying
    * pairs (geometries that actually intersect), and per-relation counts
    * (DS-JedAI `DistributedInterlinking.scala:84-118` `accumulate`).
    * Partial aggregation is map-side via Catalyst — the treeReduce of
    * the reference comes free. */
  def relationCounts(source: DataFrame, target: DataFrame,
                     granularity: String = "avg"): DataFrame = {
    val ims = de9im(source, target, granularity)
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).as(c)
    ims.agg(
      count(lit(1)).as("verifications"),
      cnt("intersects"), cnt("contains"), cnt("within"), cnt("covers"),
      cnt("coveredby"), cnt("crosses"), cnt("overlaps"), cnt("touches"),
      cnt("equals"))
  }
}

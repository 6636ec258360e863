package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, In, InSet, Literal}
import org.apache.spark.sql.execution.{ColumnarToRowExec, FileSourceScanExec, FilterExec, InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Automated plan conformance audit over EVERY gate query: executes
  * each at the given scale factor and asserts the scale-shape
  * invariants on the FINAL adaptive physical plans:
  *
  *   1. no `WindowExec` with an empty partition spec anywhere — an
  *      unpartitioned window moves all rows to one partition, the
  *      scale-killer class eliminated in round 2;
  *   2. cartesian / broadcast-nested-loop joins only in the
  *      documented exact-baseline queries (dd7 brute-force dedup, ann1
  *      brute-force top-k, the ANN codebook scans) whose bucketed
  *      scale paths are dd8/ann3/ann4/ann5/ann8;
  *   3. on EVERY gate query (widened from q*-only in round 7): no
  *      shuffle exchange sitting directly on an UNREDUCED parquet
  *      scan — every scanned table must shrink before it moves: a
  *      pushed filter or pruned projection inside the scan node
  *      itself, a Project/Filter/partial-aggregate above it, or a
  *      broadcast of the small side — i.e. pushdown actually reached
  *      the scan;
  *   4. on ann7/ann8: no aggregate operator outside broadcast /
  *      cached-build subtrees — the map-side-ADC guarantee that
  *      nothing shuffles between candidate generation and the top-k
  *      ranking window;
  *   5. no FilterExec carrying a pushable column-vs-literal atom
  *      directly above a scan that pushed NOTHING — rule 3's
  *      reduction test accepts column pruning, so a regression that
  *      silently loses filter pushdown (while pruning still holds)
  *      would otherwise go uncaught (round-7 advisory);
  *   6. partition pruning: a FilterExec above a PARTITIONED scan must
  *      not retain a deterministic conjunct referencing only
  *      partition columns while the scan's `partitionFilters` is
  *      empty — such conjuncts are exactly what FileSourceStrategy
  *      moves into the scan for pruning, so one left behind with
  *      nothing pruned means a full-catalog scan of a partitioned
  *      table (round-8 verdict item; the gate tables are single
  *      files, so this rule guards the library's partitioned-read
  *      path, exercised in PlanAuditSpec);
  *   7. no window partitioned ONLY by low-NDV gate-table columns
  *      (round-9 verdict item — the q18 funnel class: |partitions| =
  *      the column's domain, so one task sorts a whole domain value
  *      regardless of shuffle.partitions). The global stage of a
  *      shard-local → global top-k decomposition is accepted
  *      structurally (a descendant window over a strict superset of
  *      the keys caps its input); domain-bounded windows over
  *      aggregate-reduced rows carry a named whitelist entry.
  *
  * Rule 2 admits a broadcast-nested-loop join structurally when its
  * build side is aggregate-reduced (a trained codebook / LUT bounded
  * by its grouping keys) — the name whitelist remains only for the
  * documented exact-scan baselines whose broadcast side is raw data.
  *
  * Runs from `sbt test` (PlanAuditSpec) so plan-shape regressions fail
  * CI, and as a main for the driver. Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {

  // dd7/ann1: documented exact baselines (bucketed scale paths are
  // dd8/ann3/ann4). ann3/ann5: the cell-assignment crossJoin broadcasts
  // the CENTROID table — ceil(sqrt(n))/2 rows for ann3, ceil(sqrt(n))
  // for ann5 — which is the standard IVF coarse-quantizer shape (every
  // vector must score every centroid), not an unbounded data-data join.
  private val allowedUnbounded =
    Set("dd7_embedding_dups", "ann1_cosine_topk", "ann3_ivf_topk",
        "ann6_sq_topk",
        // ann7: brute ADC scan by contract — candidates are every
        // (query, vector) pair; the BNLJ broadcasts the per-query
        // 128-entry lookup-table frame, and storage (8 code
        // bytes/vector) is where PQ wins, not candidate pruning
        "ann7_pq_topk",
        // ann8 composes ann5's centroid-broadcast assignment with
        // ann7's broadcast LUT ranking — same whitelisted shapes;
        // ann11 is ann8 + a broadcast-shortlist exact rerank
        "ann8_ivfpq_topk", "ann11_rerank_topk",
        "ann5_ivf_scaled",
        // ann9/ann10: exact-scan baselines by the same contract as
        // ann1 (filtered top-k / range search verify step); the scale
        // path is the IVF probe (ann5/ann8) resp. the banded
        // hyperplane candidates (ann4/dd8) with the metadata filter /
        // τ-threshold applied to the bounded candidate list
        "ann9_filtered_topk", "ann10_range_search",
        // dd14: same centroid-broadcast assignment as ann5/ann8; the
        // pair search itself is a cell-keyed equi-join, not unbounded
        "dd14_semantic_dedup",
        // ann18/ann21: recall evaluation — the brute arm is the exact
        // scan BY DEFINITION of the metric (ground truth for recall@k);
        // the measured arms (ann5's probe path / the beam rounds over
        // the prebuilt graph) are bounded
        "ann18_recall_eval", "ann21_beam_search")

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    here
  }

  /** Nodes that merely adapt representation between an exchange and
    * the scan feeding it — walking through them, a shuffle is still
    * "directly above" the scan. */
  private def throughTransparent(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => throughTransparent(a.executedPlan)
    case q: QueryStageExec => throughTransparent(q.plan)
    case w: WholeStageCodegenExec => throughTransparent(w.child)
    case i: InputAdapter => throughTransparent(i.child)
    case c: ColumnarToRowExec => throughTransparent(c.child)
    case r: ReusedExchangeExec => throughTransparent(r.child)
    case other => other
  }

  /** Walk skipping broadcast-build and cached subtrees: what remains
    * is the candidate/probe path whose shape the ADC check constrains. */
  private def walkProbeSide(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walkProbeSide(a.executedPlan)
    case q: QueryStageExec => walkProbeSide(q.plan)
    case _: BroadcastExchangeExec => Seq.empty
    case other if other.nodeName.contains("InMemoryTableScan") => Seq.empty
    case other => other +: other.children.flatMap(walkProbeSide)
  }

  private def isAggregate(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _ => false
  }

  /** True when the subtree contains an aggregate — descending through
    * adaptive wrappers, reused exchanges, AND cached relations (a
    * memoized codebook hides its groupBy inside the InMemoryRelation's
    * cached plan). A broadcast-nested-loop join whose BUILD side passes
    * this is a data × reduced-table product (e.g. every vector scored
    * against a trained centroid table bounded by its grouping-key
    * cardinality), not an unbounded data × data blowup — so rule 2
    * admits it structurally instead of by query-name whitelist. */
  private def hasAggregate(p: SparkPlan): Boolean = {
    def all(x: SparkPlan): Seq[SparkPlan] = {
      val kids = x match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
        case other => other.children
      }
      x +: kids.flatMap(all)
    }
    all(p).exists {
      // a lineage-cut memo frame (DfCache round 15) erases its build
      // plan — the aggregate proof lives in the recorded provenance
      case r: org.apache.spark.sql.execution.RDDScanExec =>
        graft.spark.DfCache.isAggregateReduced(r.rdd.id)
      case other => isAggregate(other)
    }
  }

  private def isReducedBroadcastProduct(b: BroadcastNestedLoopJoinExec): Boolean = {
    val build = b.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
      case _ => b.right
    }
    hasAggregate(build)
  }

  /** A predicate atom Spark's parquet source can always push: a
    * column-vs-literal comparison or an IN list. If a FilterExec
    * holding at least one such atom sits directly on a scan whose
    * `dataFilters` is EMPTY, filter pushdown was lost (column pruning
    * alone would still satisfy the rule-3 reduction test — this is the
    * regression class rule 5 exists to catch). Deliberately
    * non-pushable predicates (analysis barriers, UDF-wrapped columns)
    * contain no such atom and are not flagged. */
  private def hasPushableAtom(e: Expression): Boolean = e match {
    case b: BinaryComparison =>
      (b.left.isInstanceOf[Attribute] && b.right.isInstanceOf[Literal]) ||
        (b.right.isInstanceOf[Attribute] && b.left.isInstanceOf[Literal])
    case In(a: Attribute, vs) => vs.forall(_.isInstanceOf[Literal])
    case InSet(_: Attribute, _) => true
    case other => other.children.exists(hasPushableAtom)
  }

  /** Conjuncts FileSourceStrategy would move into `partitionFilters`:
    * deterministic predicates whose references are ALL partition
    * columns. Mixed conjuncts (partition OR data column) legitimately
    * cannot prune and are not counted. */
  private[graft] def partitionOnlyConjuncts(
      cond: Expression, partCols: Set[String]): Seq[Expression] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    // Case-insensitive name match: Spark's default resolver is
    // case-insensitive, so a filter written against an upper-cased
    // partition column still resolves (and still should prune) — the
    // audit must not let it escape on a case mismatch.
    val partColsLower = partCols.map(_.toLowerCase(java.util.Locale.ROOT))
    split(cond).filter(c => c.deterministic && c.references.nonEmpty &&
      c.references.forall(a =>
        partColsLower(a.name.toLowerCase(java.util.Locale.ROOT))))
  }

  /** Rule 7 — low-cardinality-partition windows. Columns of the gate
    * tables whose domain is a small enum: a window partitioned ONLY by
    * these has |partitions| bounded by the column's domain (< any
    * realistic shuffle.partitions), so each task sorts an entire
    * domain-value's rows no matter how the cluster scales — the q18
    * funnel class from the round-9 verdict. Low-NDV by data contract,
    * not by name shape, so the list is explicit. */
  private val lowNdvCols = Set(
    "l_returnflag", "l_linestatus", "l_shipmode", "l_shipinstruct",
    "o_orderstatus", "o_orderpriority", "c_mktsegment", "r_name", "n_name",
    "p_mfgr", "p_brand", "p_container", "event_type", "source", "lang")

  /** Windows whose per-partition input is bounded by construction and
    * documented at the definition site — the one shape rule 7 cannot
    * see structurally: q16's trailing-rate window runs over per-(type,
    * hour) AGGREGATED rows, so a partition holds at most the hour
    * domain (time-retention-bounded), not a data-proportional row set. */
  private val allowedLowNdvWindows = Set("q16_hourly_anomaly")

  private def partitionNames(spec: Seq[Expression]): Set[String] =
    spec.flatMap {
      case a: Attribute => Seq(a.name.toLowerCase(java.util.Locale.ROOT))
      // computed partition keys (md5 shards etc.) project to fresh
      // attrs (_w0...) — never in the low-NDV list, so not flagged
      case e => e.references.map(_ => "__computed__").toSeq.take(1)
    }.toSet

  private def windowPartitionNames(w: WindowExec): Set[String] =
    partitionNames(w.partitionSpec)

  /** True when `w` is the GLOBAL stage of the proven shard-local →
    * global decomposition: some descendant WindowExec partitions by a
    * strict superset of `w`'s keys (the shard-local stage), whose rank
    * filter caps `w`'s input at shards × k rows per key. */
  private def hasShardedLocalStage(w: WindowExec): Boolean = {
    val mine = windowPartitionNames(w)
    // the exemption needs BOTH halves of the decomposition: the
    // superset-key local window AND a Filter strictly between the two
    // stages (the rank cap that bounds the global stage's input at
    // shards × k rows per key) — a superset-key window alone, with the
    // global window running over the full un-filtered row set, is
    // exactly the funnel this rule exists to flag.
    // Spark 4's InferWindowGroupLimit can REWRITE the local stage: when
    // the rank column itself is pruned (a column-pruned duplicate arm of
    // a diamond), Window+Filter collapses into a bare WindowGroupLimitExec
    // in Final mode — itself the cap (≤ limit rows per key emitted), so
    // it satisfies the exemption with no separate Filter.
    def search(p: SparkPlan, filterSeen: Boolean): Boolean = p match {
      // unwrap AQE wrappers (children = Nil on a QueryStageExec) the
      // same way walk() does, or the search dies at a stage boundary
      case a: AdaptiveSparkPlanExec => search(a.executedPlan, filterSeen)
      case q: QueryStageExec => search(q.plan, filterSeen)
      case r: ReusedExchangeExec => search(r.child, filterSeen)
      case f: FilterExec => f.children.exists(search(_, true))
      case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        val theirs = partitionNames(g.partitionSpec)
        (mine.subsetOf(theirs) && theirs.size > mine.size) ||
          g.children.exists(search(_, filterSeen))
      case inner: WindowExec =>
        val theirs = windowPartitionNames(inner)
        (filterSeen && mine.subsetOf(theirs) && theirs.size > mine.size) ||
          inner.children.exists(search(_, filterSeen))
      case other => other.children.exists(search(_, filterSeen))
    }
    w.children.exists(search(_, filterSeen = false))
  }

  /** Count-plan elision probe (round 14): joins/windows counted in the
    * gate's optimized ROW plan vs its optimized COUNT plan. Under a
    * count-only consumer, Spark 4's distinct-keys join elimination
    * drops outer joins against unique-keyed aggregates, and column
    * pruning drops windows/value expressions whose results don't
    * affect cardinality — a `.count()`-driven benchmark then measures
    * a plan the gate never runs for real consumers. A sweep of this
    * probe over all 188 gates found 16 such cases (ann21's count plan
    * eliminates 54 joins; ta24's Scale row read 0.16 s at 100× where
    * the materialized chain costs ~1.3 s), which is why every
    * measurement main drives gates through [[Bench.materializedCount]]
    * (full toRdd materialization — nothing elidable) instead of
    * count(). Exposed for the HarnessSpec contract tests; not a plan
    * VIOLATION, because gate plans are allowed to be elidable — the
    * harness just must not hand the optimizer the chance. */
  private[graft] def countElision(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def counts(
        p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): (Int, Int) = {
      var j = 0; var w = 0
      p.foreach {
        case _: org.apache.spark.sql.catalyst.plans.logical.Join => j += 1
        case _: org.apache.spark.sql.catalyst.plans.logical.Window => w += 1
        case _ => ()
      }
      (j, w)
    }
    val (rowJoins, rowWindows) = counts(df.queryExecution.optimizedPlan)
    val (cntJoins, cntWindows) =
      counts(df.groupBy().count().queryExecution.optimizedPlan)
    (if (cntJoins < rowJoins)
      Seq(s"count() plan eliminates ${rowJoins - cntJoins} join(s)")
    else Seq.empty) ++
    (if (cntWindows < rowWindows)
      Seq(s"count() plan eliminates ${rowWindows - cntWindows} window(s)")
    else Seq.empty)
  }

  /** Audit one executed DataFrame (the plan must be finalized by an
    * action first); returns the rule violations. Exposed so specs can
    * audit plans outside the gate registry (e.g. the partitioned-scan
    * cases for rule 6). */
  private[graft] def auditPlan(name: String,
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
        val nodes = walk(df.queryExecution.executedPlan)
        val globalWindows = nodes.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        val unbounded = nodes.collect {
          case c: CartesianProductExec => c: SparkPlan
          case b: BroadcastNestedLoopJoinExec
            if !isReducedBroadcastProduct(b) => b: SparkPlan
        }
        // "Reduced before it moves" counts reduction pushed INTO the
        // scan node itself: a pruned ReadSchema (fewer columns than the
        // file) or a pushed data filter means the exchange carries a
        // narrowed table even with no separate Project/Filter node.
        def scanIsReduced(scan: FileSourceScanExec): Boolean =
          scan.requiredSchema.length < scan.relation.dataSchema.length ||
            scan.dataFilters.nonEmpty || scan.partitionFilters.nonEmpty
        val nakedShuffledScans =
          nodes.collect {
            case s: ShuffleExchangeExec =>
              throughTransparent(s.child) match {
                case scan: FileSourceScanExec if !scanIsReduced(scan) => s
                case _ => null
              }
          }.filter(_ != null)
        val probeAggs =
          if (name != "ann7_pq_topk" && name != "ann8_ivfpq_topk") Seq.empty
          else walkProbeSide(df.queryExecution.executedPlan).filter(isAggregate)
        // rule 5: a filter with a pushable column-vs-literal atom
        // sitting directly on a scan that pushed NOTHING = lost
        // filter pushdown (mere column pruning would still pass rule 3)
        val unpushedFilters = nodes.collect {
          case f: FilterExec =>
            throughTransparent(f.child) match {
              case scan: FileSourceScanExec
                if scan.dataFilters.isEmpty && scan.partitionFilters.isEmpty &&
                  hasPushableAtom(f.condition) => f
              case _ => null
            }
        }.filter(_ != null)
        // rule 6: a filter retaining a partition-only conjunct above a
        // PARTITIONED scan whose partitionFilters is empty = partition
        // pruning lost (a full-catalog scan of a partitioned table)
        // rule 7: a window partitioned only by low-NDV gate-table
        // columns funnels each domain value's full row set into one
        // task — unless it is the global stage of a shard-local →
        // global decomposition (input capped by the local stage) or a
        // documented domain-bounded window
        val lowNdvWindows =
          if (allowedLowNdvWindows(name)) Seq.empty
          else nodes.collect {
            case w: WindowExec
              if w.partitionSpec.nonEmpty &&
                windowPartitionNames(w).forall(lowNdvCols) &&
                !hasShardedLocalStage(w) => w
          }
        val unprunedPartitions = nodes.collect {
          case f: FilterExec =>
            throughTransparent(f.child) match {
              case scan: FileSourceScanExec
                if scan.relation.partitionSchema.nonEmpty &&
                  scan.partitionFilters.isEmpty &&
                  partitionOnlyConjuncts(f.condition,
                    scan.relation.partitionSchema.fieldNames.toSet).nonEmpty => f
              case _ => null
            }
        }.filter(_ != null)
        Seq(
          if (globalWindows.nonEmpty)
            Some(s"${globalWindows.size} unpartitioned WindowExec") else None,
          if (unbounded.nonEmpty && !allowedUnbounded(name))
            Some(s"${unbounded.size} cartesian/BNLJ node(s)") else None,
          if (nakedShuffledScans.nonEmpty)
            Some(s"${nakedShuffledScans.size} shuffle(s) directly above a " +
              "parquet scan (nothing pushed down before the move)") else None,
          if (probeAggs.nonEmpty)
            Some(s"${probeAggs.size} aggregate(s) on the ADC candidate path " +
              "(ranking must be map-side)") else None,
          if (unpushedFilters.nonEmpty)
            Some(s"${unpushedFilters.size} pushable filter(s) directly above " +
              "a scan that pushed nothing (filter pushdown lost)") else None,
          if (unprunedPartitions.nonEmpty)
            Some(s"${unprunedPartitions.size} partition-only filter(s) above " +
              "a partitioned scan with empty partitionFilters " +
              "(partition pruning lost)") else None,
          if (lowNdvWindows.nonEmpty)
            Some(s"${lowNdvWindows.size} window(s) partitioned only by " +
              "low-NDV column(s) (task count bounded by the column domain, " +
              "not shuffle.partitions)") else None
        ).flatten
  }

  /** Audit every gate query at `sfDir`; returns (query, problems)
    * pairs — empty problem lists mean a clean plan. Errors surface as
    * a one-element problem list. */
  def auditAll(spark: SparkSession, sfDir: String): Seq[(String, Seq[String])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val problems = try {
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan
        auditPlan(name, df)
      } catch {
        case e: Throwable => Seq(s"ERR ${e.getMessage}")
      }
      name -> problems
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.spark.SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var violations = 0
    auditAll(spark, sfDir).foreach { case (name, problems) =>
      if (problems.isEmpty) println(s"[plan-audit] ok   $name")
      else { violations += problems.size
             println(s"[plan-audit] FAIL $name: ${problems.mkString("; ")}") }
    }
    println(s"[plan-audit] violations=$violations")
    graft.spark.DfCache.release(spark)
    spark.stop()
    if (violations > 0) sys.exit(1)
  }
}

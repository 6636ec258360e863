package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative connected components over an undirected edge list — the
  * clustering step of a near-duplicate pipeline (documents linked by
  * verified similarity pairs collapse into clusters; the canonical doc
  * is the cluster minimum).
  *
  * Algorithm: min-label propagation with pointer jumping. Every vertex
  * starts labelled with its own id; each round a vertex takes the
  * minimum label among itself and its neighbours (one distributed join
  * + partial-aggregated groupBy), then labels shortcut through the
  * label table itself (label := label(label)), which doubles the
  * propagation distance per round — convergence in O(log diameter)
  * rounds instead of O(diameter), the same asymptotic as the
  * large-star/small-star MapReduce formulation (Kiveris et al., SoCC
  * 2014). Fixpoint = every vertex holds the smallest reachable id.
  *
  * Two contracts that make the loop safe at scale:
  *   - a checkpoint per round truncates the logical plan — a
  *     persisted-but-not-checkpointed loop grows its lineage (and plan
  *     strings, and closure serialization) with every iteration.
  *     Default is `localCheckpoint` (executor-local, unreliable under
  *     executor loss — fine for single-JVM harnesses); pass
  *     `checkpointDir = Some(dfsPath)` for reliable DFS-backed
  *     checkpoints on clusters ([[graft.spark.Checkpoints]]);
  *   - the previous round's labels are unpersisted as soon as the next
  *     round materializes, so executor storage stays O(|V|).
  *
  * Only vertices that appear in an edge are emitted (isolated rows are
  * their own singleton clusters by definition and need no join).
  */
object Components {

  /** @param edges DataFrame with `src`, `dst` columns (undirected;
    *              one row per edge, either orientation).
    * @return (id, component) — component = min reachable vertex id. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
                          checkpointDir: Option[String] = None): DataFrame =
    connectedComponentsWithStats(edges, maxIter, checkpointDir)._1

  /** As [[connectedComponents]], also reporting ROUNDS-TO-CONVERGENCE
    * (the loop exits when a round changes no label, so the value is
    * the converging round count + 1 verification round). Pointer
    * jumping doubles propagation distance per round — rounds grow as
    * O(log max-component-diameter), which the Scale harness records
    * at 1×/10×/100× as a measured fact. If a corpus ever produced a
    * giant high-diameter component whose round count grew past ~15,
    * the escalation path is the large-star/small-star formulation
    * (Kiveris et al., SoCC 2014), which contracts components in
    * O(log n) rounds independent of diameter. */
  def connectedComponentsWithStats(edges: DataFrame,
                                   maxIter: Int = 30,
                                   checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    def cut(df: DataFrame): DataFrame =
      graft.spark.Checkpoints.cut(df, checkpointDir)
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cut(und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    val labelType = labels.schema("label").dataType
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // Neighbour minimum in ONE join + ONE groupBy: edge-propagated
      // labels union the self rows, and the self row (unique per id)
      // smuggles the previous label through the aggregate as
      // max(old) — no separate left-join to re-attach vertices without
      // incoming edges, and no extra join for the convergence check.
      val prop = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("label"),
          lit(null).cast(labelType).as("old"))
      val stepped = prop.unionByName(
          labels.select(col("id"), col("label"), col("label").as("old")))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      // pointer jump: label := min(label, label(label)) — labels are
      // themselves vertex ids, so the lookup is a self-join
      val jumped = stepped.as("x")
        .join(stepped.select(col("id").as("jid"), col("label").as("jlabel")),
          col("x.label") === col("jid"))
        .select(col("x.id").as("id"), col("x.old").as("old"),
          least(col("x.label"), col("jlabel")).as("label"))
      // The convergence count rides the checkpoint's materialization
      // job: an accumulator bumped while projecting away `old` — one
      // job per round total, no separate join+count. (A retried task
      // can only over-count, which at worst buys one harmless extra
      // round; it can never end the loop early.)
      val acc = edges.sparkSession.sparkContext
        .longAccumulator("graft.ccChanged")
      val narrow = org.apache.spark.sql.types.StructType(
        Seq(jumped.schema("id"), jumped.schema("label")))
      val next = cut(jumped.mapPartitions { rows =>
        rows.map { r =>
          if (r.get(1) != r.get(2)) acc.add(1L)
          org.apache.spark.sql.Row(r.get(0), r.get(2))
        }
      }(org.apache.spark.sql.Encoders.row(narrow)))
      changed = acc.value
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    und.unpersist(blocking = false)
    (labels.withColumnRenamed("label", "component"), it)
  }

  /** Alternating large-star / small-star connected components
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the giant-component-robust alternative to
    * [[connectedComponents]]: round count is O(log n) REGARDLESS of
    * component diameter (pointer jumping is O(log diameter), which is
    * fine for near-dup cluster graphs but degrades on a path-shaped
    * giant component).
    *
    * Both star operations are expressed WITHOUT per-key neighbor
    * lists — a hub node's neighborhood never materializes on one
    * executor: the per-node minimum is a partial-aggregated groupBy
    * and each edge row picks it up by an equi-join, so every step is
    * bounded shuffle work even when a single component holds the
    * whole graph.
    *
    *   large-star(E): over both orientations, attach
    *     m(u) = min(Γ(u) ∪ u) and emit (v, m(u)) for v > u;
    *   small-star(E): orient u > v, attach m(u) = min(Γ<(u) ∪ u),
    *     emit (v, m(u)) for v ≠ m(u) plus (u, m(u)).
    *
    * Convergence = the small-star pass changes nothing (checked by a
    * count + order-independent hash signature, then CONFIRMED with an
    * exact exceptAll before exiting — the signature only decides when
    * to pay for the exact check). At the fixpoint the edge set is a
    * disjoint union of stars centered on component minima.
    *
    * @return ((id, component) rows for every non-isolated vertex,
    *         alternation rounds executed) */
  def connectedComponentsAlternating(edges: DataFrame,
                                     maxIter: Int = 50,
                                     checkpointDir: Option[String] = None)
      : (DataFrame, Int) = {
    def cut(df: DataFrame): DataFrame =
      graft.spark.Checkpoints.cut(df, checkpointDir)
    val spark = edges.sparkSession
    import org.apache.spark.sql.functions.{greatest, least, xxhash64, sum, count => fcount}
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val e2 = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val mins = e2.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      e2.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is (u > v)-oriented: Γ<(u) is exactly its v column
      val mins = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val withM = e.join(mins, "u")
      withM.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(withM.select(col("u"), col("m").as("v")))
        .distinct()
    }
    def signature(e: DataFrame): (Long, BigDecimal) = {
      // decimal(38,0) accumulator: a sum of 64-bit hashes overflows a
      // long under ANSI mode after a few dozen rows
      val r = e.agg(fcount(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).head
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }
    var e = cut(canon(edges.select(col("src").cast("long").as("u"),
      col("dst").cast("long").as("v"))))
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val next = cut(canon(smallStar(largeStar(e))))
      it += 1
      if (signature(next) == signature(e))
        converged = next.exceptAll(e).isEmpty && e.exceptAll(next).isEmpty
      val prev = e
      e = next
      prev.unpersist(blocking = false)
    }
    // fixpoint edges are star rays (member > center = component min);
    // centers label themselves
    val labels = e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    (labels, it)
  }
}

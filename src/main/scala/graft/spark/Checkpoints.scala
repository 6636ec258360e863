package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for iterative DataFrame loops (KnnJoin,
  * Components): every round MUST checkpoint or the logical plan grows
  * until plan stringification / closure serialization dominates.
  *
  * Two modes:
  *  - default (`dir = None`): `localCheckpoint(eager)` — executor-local
  *    block storage, no DFS round-trip. Spark documents it as
  *    UNRELIABLE under executor loss/decommission; right for
  *    single-JVM harnesses (this repo's gates/bench/scale) and
  *    fail-fast batch jobs that simply rerun.
  *  - reliable (`dir = Some(path)`): DFS-backed `checkpoint(eager)`
  *    rooted at `path` — survives executor loss, the deployable mode
  *    for long multi-round jobs on real clusters. The context's
  *    checkpoint dir is set on first use and then reused: Spark keys
  *    one checkpoint root per SparkContext, so the FIRST dir a context
  *    sees wins (documented contract; passing a different dir later
  *    logs nothing and uses the established root).
  */
object Checkpoints {

  /** Truncate `df`'s lineage eagerly — reliable iff `dir` is set.
    *
    * The reliable arm persists BEFORE checkpointing: Spark's documented
    * behavior for an unpersisted RDD is to compute the plan twice (once
    * for the eager action, once more when ReliableRDDCheckpointData
    * writes the files) — a 2× per-round cost on exactly the long
    * cluster jobs this mode targets, and a double-count of any
    * accumulators in the plan. The cache is dropped once the checkpoint
    * files exist (readers hit the DFS copy). Checkpoint directories are
    * cleaned by Spark only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false) — long-lived apps should set it or reap `dir` themselves. */
  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint(eager = true)
      cached.unpersist(blocking = false)
      out
    case None =>
      df.localCheckpoint(eager = true)
  }
}

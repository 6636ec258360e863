package graft.spark

import org.apache.spark.sql.SparkSession

/** Engine session defaults shared by every measurement/driver main
  * (round 15).
  *
  * `spark.sql.adaptive.coalescePartitions.minPartitionSize`: AQE
  * coalesces post-shuffle partitions by BYTES — with
  * `parallelismFirst=true` (default) the target size is
  * max(totalBytes / defaultParallelism, minPartitionSize), so any
  * exchange smaller than cores × 1 MiB (the default floor) collapses
  * toward a handful of partitions. That is the right call when
  * per-row cost tracks bytes, and exactly wrong for COMPUTE-DENSE
  * narrow stages: sp10's forced segmented DE-9IM verification (~ms of
  * JTS per pair over a ~3 MiB exchange) was measured running its
  * entire stage on ONE task — 8 single-task stages, wall 5.7 s with
  * 32 idle cores. Lowering the floor to 64 KiB keeps such exchanges
  * at ~defaultParallelism partitions while leaving every exchange
  * larger than cores × 1 MiB EXACTLY as before (its target is already
  * totalBytes/parallelism) — i.e. the knob is scale-adaptive by
  * construction: it derives from core count and only moves
  * small-byte/high-cost stages, never production-sized shuffles. Env
  * override `GRAFT_MIN_PARTITION_SIZE` for experiments.
  */
object SessionTuning {
  def minPartitionSize: String =
    sys.env.getOrElse("GRAFT_MIN_PARTITION_SIZE", "64k")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      minPartitionSize)
}

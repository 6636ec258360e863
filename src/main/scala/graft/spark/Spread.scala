package graft.spark

import org.apache.spark.sql.DataFrame

/** Site-selective parallelism repair for UNSPLITTABLE small inputs
  * (round 15; guide §2.5's repartition-after-read): the gate-scale
  * tables are single-row-group parquet files, so their scans are ONE
  * partition no matter what `files.minPartitionNum` asks (a row group
  * is the split atom) — and any per-row-HEAVY stage with no exchange
  * below it then runs serially on a 32-core session. A round-robin
  * repartition to defaultParallelism fixes that at the cost of moving
  * the rows once.
  *
  * Applied ONLY where the downstream per-row cost dominates that move
  * (measured, fresh-JVM A/B at sf0.1): the brute-force cosine arms
  * (dd7 2.43 s → 0.71 s) and the spatial verification pair path. A
  * blanket spread in Tables.table was measured and REVERTED: agg-first
  * scans get slower (q1 0.46 s → 1.02 s — the exchange costs more than
  * the serial partial agg it parallelizes), and cheap per-row maps
  * break even at best (ta17 0.58 s → 0.76 s).
  *
  * No-op when the input already carries >= defaultParallelism
  * partitions, so production-scale scans (many splits) never pay it —
  * the knob derives from core count, nothing is tuned to local mode.
  * `GRAFT_SPREAD=0` disables for A/B experiments.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (sys.env.getOrElse("GRAFT_SPREAD", "1") == "0") df
    // toRdd reads the planned partition count without appending the
    // row-deserializer conversion that `.rdd` plans (r15 verdict: the
    // `.rdd` form planned a conversion frame once per call)
    else if (df.queryExecution.toRdd.getNumPartitions >= p) df
    else df.repartition(p)
  }
}

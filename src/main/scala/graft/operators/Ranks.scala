package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed exact global ranking / running totals without a
  * single-partition `WindowExec`.
  *
  * `Window.orderBy(...)` with no `partitionBy` moves every row to ONE
  * partition — the scale-killer the reference avoids by prorating
  * per-partition budgets into bounded priority queues (DS-JedAI
  * `linkers/progressive/ProgressiveGIAnt.scala:26`). The declarative
  * alternative used here is the classic range-exchange + offset scheme
  * (what `RDD.zipWithIndex` does under the hood):
  *
  *  1. `repartitionByRange(ordering)` + `sortWithinPartitions` — every
  *     partition holds a contiguous, sorted slice of the total order;
  *     parallelism = `spark.sql.shuffle.partitions`.
  *  2. A lightweight job computes each partition's row count (and the
  *     partial sums of any requested value columns). Only
  *     `numPartitions` tuples reach the driver — never rows.
  *  3. A second pass assigns `rank = offset(p) + local index` (and the
  *     running sums seeded with the partial-sum offsets).
  *
  * Both passes run over the SAME RDD object, so the expensive upstream
  * lineage (candidate join, weights, any JTS predicate) executes once:
  * the shuffle files written by pass 2's map side are reused and the
  * stats job's stages show as "skipped". Total cost over a global
  * window: one extra counting job, zero extra shuffles, no partition
  * ever holds more than its range slice.
  */
object Ranks {

  /** A ranked/summed frame plus the grand totals of each requested
    * value column (index-aligned with `values`); `totals.head` is the
    * total row count when obtained via [[withGlobalRank]]. */
  final case class RunningTotals(df: DataFrame, totals: Seq[Long])

  /** Per-group offsets for [[runningTotals]] consumers that subtract a
    * group baseline from the global running sum: each group's offset is
    * the PREVIOUS group's end in EXACTLY the order the range exchange
    * sorted the string key — UTF-8 binary, NULLs first. Scala's default
    * String ordering is UTF-16 code-unit order, which disagrees with
    * Spark's UTF8String binary order for supplementary-plane characters
    * (surrogates sort before U+E000..U+FFFF in UTF-16, after in UTF-8),
    * so a plain `sortBy(_._1)` would assign offsets to the wrong
    * groups. Returns (non-null-key offsets, offset of the NULL group) —
    * a Scala Map cannot carry the null key a nullable column produces.
    * `ends` = per-group max of the running sum, any order. */
  def groupOffsets(ends: Seq[(String, Long)]): (Map[String, Long], Long) = {
    val sorted = sortedLikeRangeExchange(ends)
    toOffsets(sorted.map(_._1).zip(0L +: sorted.map(_._2).dropRight(1)))
  }

  /** Like [[groupOffsets]] but from per-group TOTALS: offset(g) = sum
    * of the totals of every group strictly before g in the exchange's
    * key order. */
  def groupOffsetsFromTotals(totals: Seq[(String, Long)])
      : (Map[String, Long], Long) = {
    val sorted = sortedLikeRangeExchange(totals)
    toOffsets(sorted.map(_._1)
      .zip(sorted.scanLeft(0L)(_ + _._2).dropRight(1)))
  }

  private def sortedLikeRangeExchange(
      kv: Seq[(String, Long)]): Seq[(String, Long)] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    kv.sortWith { (a, b) =>
      if (a._1 == null) b._1 != null
      else if (b._1 == null) false
      else java.util.Arrays.compareUnsigned(
        a._1.getBytes(utf8), b._1.getBytes(utf8)) < 0
    }
  }

  private def toOffsets(
      offs: Seq[(String, Long)]): (Map[String, Long], Long) =
    (offs.collect { case (k, v) if k != null => k -> v }.toMap,
      offs.collectFirst { case (null, v) => v }.getOrElse(0L))

  /** Add exact 1-based global `rankCol` in the given total order. */
  def withGlobalRank(df: DataFrame, ordering: Seq[Column],
                     rankCol: String = "rank"): DataFrame =
    runningTotals(df, ordering, Nil, Nil, rankCol).df

  /** Like [[withGlobalRank]] but also returns the total row count
    * without a second evaluation of the input. */
  def withGlobalRankCounted(df: DataFrame, ordering: Seq[Column],
                            rankCol: String = "rank"): RunningTotals =
    runningTotals(df, ordering, Nil, Nil, rankCol)

  /** Rank plus running sums: `sumCols(i)` = cumulative sum of
    * `values(i)` (cast to long) over the prefix up to and including the
    * current row, in `ordering` order. */
  def runningTotals(df: DataFrame, ordering: Seq[Column], values: Seq[Column],
                    sumCols: Seq[String], rankCol: String = "rank"): RunningTotals = {
    require(values.length == sumCols.length, "values/sumCols must align")
    val spark = df.sparkSession
    val valNames = sumCols.map(c => s"__v_$c")
    val withVals = values.zip(valNames).foldLeft(df) {
      case (d, (v, n)) => d.withColumn(n, v.cast("long"))
    }
    // The range exchange evaluates its child an extra time (the
    // boundary-sampling pass runs the full upstream lineage before the
    // shuffle map stage does). Callers feed NARROW frames (ids +
    // weights, ~24 B/row), so persisting the input here makes the
    // expensive upstream — candidate join, weighting, any JTS
    // predicate — run exactly once for the whole rank pipeline. The
    // cache is dropped as soon as pass 1 has materialized the sort
    // shuffle, whose files pass 2 and every downstream consumer reuse.
    val input = withVals.persist(StorageLevel.MEMORY_AND_DISK)
    val sorted = input
      .repartitionByRange(ordering: _*)
      .sortWithinPartitions(ordering: _*)
    val schema = sorted.schema
    val valIdx = valNames.map(schema.fieldIndex).toArray
    val nVals = valIdx.length
    // ONE RDD object shared by both jobs → upstream stages run once.
    val rdd = sorted.rdd
    val nParts = rdd.getNumPartitions
    // Pass 1: per-partition row count + value partial sums (tiny result).
    val partStats: Array[(Int, Array[Long])] = rdd.mapPartitionsWithIndex {
      (pid, it) =>
        val acc = new Array[Long](nVals + 1)
        it.foreach { row =>
          acc(0) += 1
          var i = 0
          while (i < nVals) {
            if (!row.isNullAt(valIdx(i))) acc(i + 1) += row.getLong(valIdx(i))
            i += 1
          }
        }
        Iterator((pid, acc))
    }.collect()
    // Shuffle files now exist; later passes read them, never the input.
    input.unpersist(blocking = false)
    val byPid = partStats.toMap
    val offsets = Array.ofDim[Long](nParts + 1, nVals + 1)
    var p = 0
    while (p < nParts) {
      val s = byPid.getOrElse(p, new Array[Long](nVals + 1))
      var i = 0
      while (i <= nVals) { offsets(p + 1)(i) = offsets(p)(i) + s(i); i += 1 }
      p += 1
    }
    val totals = offsets(nParts)
    val bc = spark.sparkContext.broadcast(offsets)
    // Pass 2: assign rank/cumsums; shuffle output of pass 1 is reused.
    val outSchema = valNames.foldLeft(schema)((s, n) =>
      org.apache.spark.sql.types.StructType(s.filterNot(_.name == n)))
      .add(rankCol, LongType, nullable = false)
    val outSumSchema = sumCols.foldLeft(outSchema)(_.add(_, LongType, nullable = false))
    val keepIdx = schema.fieldNames.zipWithIndex
      .filterNot { case (n, _) => valNames.contains(n) }.map(_._2)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = bc.value(pid)
      val run = base.clone()
      it.map { row =>
        run(0) += 1
        var i = 0
        while (i < nVals) {
          if (!row.isNullAt(valIdx(i))) run(i + 1) += row.getLong(valIdx(i))
          i += 1
        }
        val vals = keepIdx.map(row.get) ++ (run(0) +: run.tail.toSeq)
        Row.fromSeq(vals.toSeq)
      }
    }
    RunningTotals(spark.createDataFrame(out, outSumSchema), totals.toSeq)
  }
}

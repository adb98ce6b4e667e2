package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Shared scaffolding for the range-partitioned driver-ladder
  * operators ([[RankSelect]], [[WeightedMedian]]): range repartition on
  * (group ++ orderKeys) makes every group contiguous across sorted
  * partitions, a run-length pass accumulates one Long measure per
  * (partition, group) run, and the driver's cumulative scan hands each
  * partition its group's starting offset for the final rescan.
  *
  * Driver-memory contract: O(distinct groups) tuples/maps, guarded by
  * `maxGroups` TWICE — inside the run-length task (a single partition
  * exceeding the cap aborts before anything is collected; ranges make
  * groups contiguous, so this catches skewed layouts) and by a
  * run-COUNT pre-pass before the tuple collect (contiguity bounds
  * distinct groups below total runs, so evenly-spread high-cardinality
  * layouts — where every partition individually stays under the cap —
  * abort after collecting only O(partitions) integers, never the
  * tuples themselves). Both jobs and the caller's rescan reuse the one
  * captured RDD's range-exchange shuffle files.
  */
private[graft] object RangeLadder {

  /** Collected-run-tuple budget under which the pre-gate pass is
    * unnecessary: the in-task cap alone bounds the collect at
    * partitions x maxGroups tuples, and below ~1M tuples (~100 MB
    * worst case) that is driver-safe without a second pass.
    */
  val PreGateSkipBudget: Long = 1000000L

  final case class Ladder(
      ranged: DataFrame,
      rrdd: org.apache.spark.rdd.RDD[Row],
      keyOf: Row => Seq[Any],
      starts: Map[(Int, Seq[Any]), Long],
      totals: Map[Seq[Any], Long])

  def build(rawDf: DataFrame, groupCols: Seq[String], maxGroups: Int,
      measure: Row => Long, capMsg: String, orderKeys: Seq[Column]): Ladder = {
    // single-file parquet arrives as ONE partition — spread first or
    // the range exchange itself degenerates to a single task
    val df = Parallelism.ensure(rawDf)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val allKeys = groupCols.map(col) ++ orderKeys
    val ranged = df.repartitionByRange(parts, allKeys: _*)
      .sortWithinPartitions(allKeys: _*)
    val gIdx = groupCols.map(ranged.schema.fieldIndex).toArray
    val rrdd = ranged.rdd
    def key(r: Row): Seq[Any] = gIdx.toSeq.map(r.get)
    // pre-gate: run COUNTS only (O(partitions) ints on the driver).
    // distinct groups >= total runs - (partitions - 1) under range
    // contiguity, so this refuses evenly-spread high-cardinality keys
    // before the tuple collect below can blow the driver. The pass is
    // SKIPPED when the worst case the in-task cap permits
    // (partitions x maxGroups tuples) already fits the driver budget —
    // the common low-cardinality call pays nothing extra.
    if (parts.toLong * (maxGroups + 1L) > PreGateSkipBudget) {
      val runCounts = rrdd.mapPartitionsWithIndex { case (pid, it) =>
        var n = 0L
        var cur: Seq[Any] = null
        it.foreach { r =>
          val k = key(r)
          if (cur == null || k != cur) { n += 1; cur = k }
        }
        Iterator.single(pid -> n)
      }.collect()
      val totalRuns = runCounts.map(_._2).sum
      // the gate suffix names which guard fired — a cap abort on a
      // petabyte job should say whether the layout was skewed (in-task)
      // or genuinely high-cardinality (pre-gate) without a re-run
      if (totalRuns - math.max(runCounts.length - 1, 0) > maxGroups)
        throw new IllegalStateException(capMsg +
          s" [pre-gate: >=${totalRuns - math.max(runCounts.length - 1, 0)} " +
          s"distinct groups across $totalRuns runs; no tuples collected]")
    }
    // run-length (partition, group, measure): per-partition cap check
    // still aborts skewed layouts inside the job
    val runs: Array[(Int, Seq[Any], Long)] = rrdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Long)]
        var cur: Seq[Any] = null
        var m = 0L
        it.foreach { r =>
          val k = key(r)
          if (cur == null || k != cur) {
            if (cur != null) out += ((pid, cur, m))
            if (out.size > maxGroups)
              throw new IllegalStateException(capMsg +
                s" [in-task: partition $pid alone holds >$maxGroups runs]")
            cur = k; m = 0L
          }
          m += measure(r)
        }
        if (cur != null) out += ((pid, cur, m))
        out.iterator
      }.collect()
    if (runs.iterator.map(_._2).toSet.size > maxGroups)
      throw new IllegalStateException(capMsg)
    val totals = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    val starts = scala.collection.mutable.HashMap.empty[(Int, Seq[Any]), Long]
    runs.sortBy(_._1).foreach { case (pid, k, m) =>
      val before = totals.getOrElse(k, 0L)
      starts((pid, k)) = before
      totals(k) = before + m
    }
    Ladder(ranged, rrdd, key, starts.toMap, totals.toMap)
  }

  /** Long coercion for a measure column (weights, lengths). */
  def longAt(idx: Int, colName: String)(r: Row): Long = r.get(idx) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => sys.error(s"$colName must be integral, got $other")
  }
}

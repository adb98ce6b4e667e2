package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Exact EXCLUSIVE running sum over a global total order at full
  * parallelism — the distributed replacement for
  * `sum(m) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` with an empty
  * PARTITION BY, which funnels every row through ONE task (the same
  * cliff [[RankSelect]] exists for, in scan form).
  *
  * Plan: range repartition on `orderKeys` (equal keys co-locate, so
  * partitions tile the order), one O(partitions)-driver pass collects
  * each partition's measure total, the driver's cumulative scan hands
  * each partition its starting offset, and a second partition-local
  * pass emits every row with its exclusive prefix. Both jobs reuse the
  * one captured RDD's range-exchange shuffle files, so the upstream
  * plan executes once.
  *
  * Determinism: the prefix of a row is unique iff `orderKeys` is a
  * total order. Rows that TIE on all keys get an arbitrary (but
  * stable-within-run) relative order — callers needing tie-invariant
  * results should pre-aggregate to one row per key (the MWU tie rollup
  * in q131 does exactly that).
  *
  * EAGER by construction (the [[RankSelect]] / GlobalIndex contract):
  * the per-partition totals job runs when the operator is CALLED, and
  * the returned frame's offsets snapshot that moment — re-call rather
  * than re-materialize if the source changes.
  */
object PrefixSum {

  /** Input schema + `prefixCol` (BIGINT): for each row, the sum of
    * `measureCol` (integral) over all rows strictly before it in the
    * `orderKeys` total order.
    */
  def exclusive(rawDf: DataFrame, measureCol: String, prefixCol: String,
      orderKeys: Column*): DataFrame = {
    val df = Parallelism.ensure(rawDf)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val ranged = df.repartitionByRange(parts, orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
    val rrdd = ranged.rdd
    val mIdx = ranged.schema.fieldIndex(measureCol)
    val at = RangeLadder.longAt(mIdx, measureCol) _
    val partTotals = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += at(r))
      Iterator.single(pid -> s)
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](parts)
    var acc = 0L
    partTotals.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val offB = ranged.sparkSession.sparkContext.broadcast(offsets)
    val schema = org.apache.spark.sql.types.StructType(ranged.schema :+
      org.apache.spark.sql.types.StructField(prefixCol,
        org.apache.spark.sql.types.LongType, nullable = false))
    val out = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var run = offB.value(pid)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ run)
        run += at(r)
        row
      }
    }
    ranged.sparkSession.createDataFrame(out, schema)
  }
}

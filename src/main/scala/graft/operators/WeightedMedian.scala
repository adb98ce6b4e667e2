package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact per-group WEIGHTED median at full parallelism — the weighted
  * extension of [[RankSelect]]: the selected row is the first (under
  * `orderKeys`) whose cumulative weight reaches half the group total
  * (`2*cumw >= W`, lower weighted median — the classical definition).
  *
  * Same scale shape as RankSelect: range repartition on
  * (group ++ orderKeys) makes groups contiguous across partitions, a
  * run-length pass emits per-(partition, group) WEIGHT sums
  * (O(partitions + groups) longs to the driver), the driver ladder
  * gives each partition its starting cumulative weight, and a final
  * partition-local rescan emits exactly the crossing row per group.
  * No per-group window task, no full cumulative-sum materialization.
  *
  * Weights must be non-negative integers (exactness — no float
  * accumulation ambiguity); a group whose total weight is 0 emits
  * nothing. The crossing row always carries positive weight, so the
  * selection is unique given a total `orderKeys` order.
  */
object WeightedMedian {

  def weightedMedian(rawDf: DataFrame, groupCols: Seq[String],
      weightCol: String, totalCol: String,
      orderKeys: Column*): DataFrame =
    weightedMedianCapped(rawDf, groupCols, weightCol, totalCol,
      RankSelect.DefaultMaxGroups, orderKeys: _*)

  /** [[weightedMedian]] with an explicit distinct-group cap. */
  def weightedMedianCapped(rawDf: DataFrame, groupCols: Seq[String],
      weightCol: String, totalCol: String, maxGroups: Int,
      orderKeys: Column*): DataFrame = {
    val df = Parallelism.ensure(rawDf)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val allKeys = groupCols.map(col) ++ orderKeys
    val ranged = df.repartitionByRange(parts, allKeys: _*)
      .sortWithinPartitions(allKeys: _*)
    val gIdx = groupCols.map(ranged.schema.fieldIndex)
    val wIdx = ranged.schema.fieldIndex(weightCol)
    def key(r: Row): Seq[Any] = gIdx.map(r.get)
    def wOf(r: Row): Long = r.get(wIdx) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => sys.error(s"$weightCol must be integral, got $other")
    }
    val capMsg = s"WeightedMedian: distinct group count exceeds maxGroups=$maxGroups " +
      "(driver ladder is O(groups)); use the window idiom for high-cardinality keys."
    val rrdd = ranged.rdd
    // run-length (partition, group, weight-sum) — groups are contiguous
    val runs: Array[(Int, Seq[Any], Long)] = rrdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Long)]
        var cur: Seq[Any] = null
        var w = 0L
        it.foreach { r =>
          val k = key(r)
          if (cur == null || k != cur) {
            if (cur != null) out += ((pid, cur, w))
            if (out.size > maxGroups) throw new IllegalStateException(capMsg)
            cur = k; w = 0L
          }
          w += wOf(r)
        }
        if (cur != null) out += ((pid, cur, w))
        out.iterator
      }.collect()
    if (runs.iterator.map(_._2).toSet.size > maxGroups)
      throw new IllegalStateException(capMsg)
    val totals = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    val starts = scala.collection.mutable.HashMap.empty[(Int, Seq[Any]), Long]
    runs.sortBy(_._1).foreach { case (pid, k, w) =>
      val before = totals.getOrElse(k, 0L)
      starts((pid, k)) = before
      totals(k) = before + w
    }
    val startsB = ranged.sparkSession.sparkContext.broadcast(starts.toMap)
    val totalsB = ranged.sparkSession.sparkContext.broadcast(totals.toMap)
    val schema = StructType(ranged.schema :+
      StructField(totalCol, LongType, nullable = false))
    val picked = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var cur: Seq[Any] = null
      var cumw = 0L
      var total = 0L
      it.flatMap { r =>
        val k = key(r)
        if (cur == null || k != cur) {
          cur = k
          cumw = startsB.value((pid, k))
          total = totalsB.value(k)
        }
        val prev = cumw
        cumw += wOf(r)
        // the crossing row: previous cumulative below half, now at or
        // above — exactly one row per positive-weight group
        if (total > 0 && prev * 2 < total && cumw * 2 >= total)
          Iterator.single(Row.fromSeq(r.toSeq :+ total))
        else Iterator.empty
      }
    }
    ranged.sparkSession.createDataFrame(picked, schema)
  }
}

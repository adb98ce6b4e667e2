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
    val capMsg = s"WeightedMedian: distinct group count exceeds maxGroups=$maxGroups " +
      "(driver ladder is O(groups)); use the window idiom for high-cardinality keys."
    val wIdxIn = rawDf.schema.fieldIndex(weightCol)
    def wOf(r: Row): Long = {
      val w = RangeLadder.longAt(wIdxIn, weightCol)(r)
      // documented contract: negative weights make the cumulative scan
      // non-monotone and the crossing row meaningless — fail loudly
      if (w < 0) sys.error(s"$weightCol must be non-negative, got $w")
      w
    }
    // shared range-exchange + run-length + driver-ladder scaffolding
    // (measure = weight sum); see RangeLadder for the two-level cap
    val ladder = RangeLadder.build(rawDf, groupCols, maxGroups,
      wOf, capMsg, orderKeys)
    import ladder.{ranged, rrdd, starts, totals}
    val key = ladder.keyOf
    // schema preserved by the range exchange -> same weight index
    val wIdx = ranged.schema.fieldIndex(weightCol)
    val startsB = ranged.sparkSession.sparkContext.broadcast(starts)
    val totalsB = ranged.sparkSession.sparkContext.broadcast(totals)
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
        cumw += RangeLadder.longAt(wIdx, weightCol)(r)
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

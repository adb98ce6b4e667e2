package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact per-group order statistics at full parallelism.
  *
  * The SQL idiom for a discrete per-group quantile —
  * `row_number() OVER (PARTITION BY g ORDER BY k)` then
  * `WHERE rn = target(n)` — serializes each group through one task. At
  * a handful of groups (order priority, return flag, …) that is a
  * 5-task plan regardless of cluster size: the canonical 100 TB cliff
  * for low-cardinality keys (a 20 TB group funnels through one JVM).
  *
  * This operator produces the IDENTICAL selection from a range
  * repartition on (group ++ orderKeys): every group's rows are
  * contiguous across the range partitions, so a per-partition,
  * per-group run-length count (tiny — groups are contiguous within a
  * sorted partition, so the count job emits O(parts + groups) rows)
  * cumulated on the driver gives each partition its starting rank for
  * every group it holds. A final partition-local pass emits exactly the
  * rows whose grouped rank hits the requested target — no full-rank
  * materialization, no per-group task, parallelism = partition count
  * independent of group count.
  *
  * Determinism: same contract as the window idiom — the selection is
  * unique and reproducible iff (orderKeys) is a total order within a
  * group (pass a unique id as the last key).
  *
  * EAGER by construction (like [[GlobalIndex]]): the per-group counts
  * job runs when the operator is CALLED, and the returned frame's
  * offsets are snapshots of that moment. If the underlying source
  * changes between construction and a later action, re-call the
  * operator rather than re-materializing the stale frame — unlike a
  * pure lazy plan it will not recompute its offsets.
  */
object RankSelect {

  /** Rows whose 1-based rank within their group — ordered by
    * `orderKeys` — equals `rankOf(n)` for the group's row count n.
    * Output schema = input schema + `nCol` (the group size), so
    * callers can derive rank-dependent quantities without a second
    * count. Equivalent to
    * `filter(rn === rankOf(n))` over
    * `row_number() OVER (PARTITION BY groupCols ORDER BY orderKeys)`
    * but with no per-group window.
    */
  def selectRank(rawDf: DataFrame, groupCols: Seq[String],
      rankOf: Long => Long, nCol: String, orderKeys: Column*): DataFrame =
    selectRanks(rawDf, groupCols, n => Seq("" -> rankOf(n)), null, nCol,
      orderKeys: _*)

  /** Multi-rank generalization: ONE range-partitioned pass emits, per
    * group, the row at every labeled rank `ranksOf(n)` returns — e.g.
    * all three quartiles of every group in a single shuffle instead of
    * one pass per quantile. Two labels may map to the same rank (tiny
    * groups); the row is emitted once per label. Output = input schema
    * + `labelCol` (omitted when null) + `nCol`.
    */
  def selectRanks(rawDf: DataFrame, groupCols: Seq[String],
      ranksOf: Long => Seq[(String, Long)], labelCol: String, nCol: String,
      orderKeys: Column*): DataFrame =
    selectRanksCapped(rawDf, groupCols, ranksOf, labelCol, nCol,
      DefaultMaxGroups, orderKeys: _*)

  /** Driver-memory contract: the counts pass collects O(partitions ×
    * groups-per-partition) run-length rows and broadcasts per-group
    * start/target maps, so DRIVER MEMORY IS LINEAR IN DISTINCT GROUPS.
    * That is the whole point of the operator — it trades O(groups)
    * driver state for full-parallelism selection on LOW-cardinality
    * keys. Past this cap the trade inverts and the plain window idiom
    * (which parallelizes fine when groups are plentiful) is strictly
    * better — see [[windowRanks]].
    */
  val DefaultMaxGroups: Int = 250000

  /** [[selectRanks]] with an explicit distinct-group cap. Exceeding the
    * cap raises IllegalStateException with guidance rather than letting
    * the counts collect/broadcast OOM the driver.
    */
  def selectRanksCapped(rawDf: DataFrame, groupCols: Seq[String],
      ranksOf: Long => Seq[(String, Long)], labelCol: String, nCol: String,
      maxGroups: Int, orderKeys: Column*): DataFrame = {
    val capMsg = s"RankSelect: distinct group count exceeds maxGroups=$maxGroups; " +
      "the counts collect/broadcast would be driver-memory-unsafe. For " +
      "high-cardinality group keys use RankSelect.windowRanks (the window " +
      "idiom parallelizes fine there) or raise the cap via selectRanksCapped."
    // shared range-exchange + run-length + driver-ladder scaffolding
    // (measure = row count); see RangeLadder for the two-level cap
    val ladder = RangeLadder.build(rawDf, groupCols, maxGroups,
      _ => 1L, capMsg, orderKeys)
    import ladder.{ranged, rrdd, starts, totals}
    val key = ladder.keyOf
    // per group: rank -> labels wanting that rank (labels may collide
    // on tiny groups; each emits its own row)
    val targets: Map[Seq[Any], Map[Long, Seq[String]]] =
      totals.map { case (k, n) =>
        k -> ranksOf(n).groupBy(_._2).map { case (r, ls) => r -> ls.map(_._1) }
      }
    val startsB = ranged.sparkSession.sparkContext.broadcast(starts)
    val targetsB = ranged.sparkSession.sparkContext.broadcast(targets)
    val totalsB = ranged.sparkSession.sparkContext.broadcast(totals)
    val withLabel = labelCol != null
    val extra =
      (if (withLabel)
        Seq(org.apache.spark.sql.types.StructField(labelCol,
          org.apache.spark.sql.types.StringType, nullable = false))
      else Nil) :+
        org.apache.spark.sql.types.StructField(
          nCol, org.apache.spark.sql.types.LongType, nullable = false)
    val schema = org.apache.spark.sql.types.StructType(ranged.schema ++ extra)
    val picked = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var cur: Seq[Any] = null
      var rank = 0L
      var want: Map[Long, Seq[String]] = Map.empty
      it.flatMap { r =>
        val k = key(r)
        if (cur == null || k != cur) {
          cur = k
          rank = startsB.value((pid, k))
          want = targetsB.value(k)
        }
        rank += 1L
        want.getOrElse(rank, Nil).iterator.map { label =>
          val tail = if (withLabel) Seq(label, totalsB.value(k))
            else Seq(totalsB.value(k))
          Row.fromSeq(r.toSeq ++ tail)
        }
      }
    }
    ranged.sparkSession.createDataFrame(picked, schema)
  }

  /** The plain window idiom producing the IDENTICAL selection to
    * [[selectRanks]] — `row_number()` + per-group count, filter on the
    * requested ranks. O(1) driver state at any group cardinality; the
    * high-cardinality fallback the [[selectRanksCapped]] error points
    * to. (At LOW cardinality this is the one-task-per-group cliff that
    * selectRanks exists to avoid — pick by group count.)
    */
  def windowRanks(rawDf: DataFrame, groupCols: Seq[String],
      ranksOf: Long => Seq[(String, Long)], labelCol: String, nCol: String,
      orderKeys: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = Parallelism.ensure(rawDf)
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(orderKeys: _*)
    val wg = Window.partitionBy(gcols: _*)
    val targetsOf = udf((n: Long) => ranksOf(n))
    val withLabel = labelCol != null
    val base = df
      .withColumn(nCol, count(lit(1)).over(wg))
      .withColumn("__rs_rn", row_number().over(w).cast("long"))
      .withColumn("__rs_t", explode(targetsOf(col(nCol))))
      .filter(col("__rs_rn") === col("__rs_t._2"))
    val cols = df.columns.map(col).toSeq ++
      (if (withLabel) Seq(col("__rs_t._1").as(labelCol)) else Nil) :+ col(nCol)
    base.select(cols: _*)
  }

  /** The discrete per-group median row (value at rank `(n+1) div 2` —
    * `percentile_disc(0.5)` / lower-median semantics), `orderKeys`
    * breaking ties. Output = input schema + `nCol`.
    */
  def discreteMedian(df: DataFrame, groupCols: Seq[String], nCol: String,
      orderKeys: Column*): DataFrame =
    discreteMedianCapped(df, groupCols, nCol, DefaultMaxGroups, orderKeys: _*)

  /** [[discreteMedian]] with an explicit cap — pass the real expected
    * group count: below RangeLadder's skip budget the ladder drops its
    * pre-gate pass entirely.
    */
  def discreteMedianCapped(df: DataFrame, groupCols: Seq[String], nCol: String,
      maxGroups: Int, orderKeys: Column*): DataFrame =
    selectRanksCapped(df, groupCols, n => Seq("" -> ((n + 1L) / 2L)), null,
      nCol, maxGroups, orderKeys: _*)

  /** Per-group discrete quantile VECTOR in one pass: each requested
    * quantile `label -> num/den` selects the row at rank
    * `ceil(n * num / den)` (exact integer arithmetic — DuckDB's
    * `quantile_disc` / SQL `percentile_disc` rank rule). One range
    * shuffle total, vs one full window sort per quantile in the SQL
    * idiom. Output = input schema + `labelCol` + `nCol`.
    */
  def discreteQuantiles(df: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Long, Long)], labelCol: String, nCol: String,
      orderKeys: Column*): DataFrame =
    discreteQuantilesCapped(df, groupCols, quantiles, labelCol, nCol,
      DefaultMaxGroups, orderKeys: _*)

  /** [[discreteQuantiles]] with an explicit cap (see discreteMedianCapped). */
  def discreteQuantilesCapped(df: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(String, Long, Long)], labelCol: String, nCol: String,
      maxGroups: Int, orderKeys: Column*): DataFrame =
    selectRanksCapped(df, groupCols,
      n => quantiles.map { case (label, num, den) =>
        label -> math.max(1L, (n * num + den - 1L) / den)
      }, labelCol, nCol, maxGroups, orderKeys: _*)
}

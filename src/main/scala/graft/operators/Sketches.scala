package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators (DataSketches HLL via Spark 3.5+ built-in
  * functions). The 100 TB pattern for distinct counting: build partial
  * sketches per natural partition (day / shard / source) — a few KB
  * each — then union sketches instead of reshuffling raw keys. A month
  * of "distinct users" over billions of events becomes a merge of 30
  * sketches; re-aggregation to any coarser grain needs no second scan
  * of the data.
  */
object Sketches {

  /** Per-group partial HLL sketches of `valueCol` (binary, mergeable).
    * lgK = 14 keeps the sketch in exact (coupon) mode well beyond 1e3
    * distincts and within ~0.5% beyond that.
    */
  def hllPartial(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** Merge partial sketches up to a coarser grouping (empty = global)
    * and estimate the distinct count.
    */
  def hllMergeEstimate(partials: DataFrame, groupCols: Seq[String],
      out: String = "distinct_est"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col("hll_sketch")))
    if (groupCols.isEmpty) partials.agg(merged.as(out))
    else partials.groupBy(groupCols.map(col): _*).agg(merged.as(out))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band/range join: match right rows whose timestamp falls in the
  * preceding `windowMicros` of each left row, per key.
  *
  * Scale design: a naive theta-join is O(|L|·|R|) per key. Here each
  * right row is bucketed to floor(ts/W) and duplicated into buckets
  * {b, b+1}; since any in-window pair spans at most one bucket boundary,
  * equality join on (key, bucket) finds every candidate with only 2×
  * right-side duplication, then the exact range predicate refines.
  * Shuffle volume is O(|L| + 2|R|) and Catalyst keeps it a hash join.
  */
object RangeJoin {

  /** Returns `left` with `n_in_window` = number of right rows with
    * right.ts in [left.ts - windowMicros, left.ts] and matching key.
    * Left rows with no match get 0.
    */
  def countInPrecedingWindow(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, windowMicros: Long,
      idCol: String = "event_id"): DataFrame = {
    val w = windowMicros
    val r = right.select(
      col(keyCol).as("__rkey"),
      unix_micros(col(tsCol)).as("__r_us"))
      .withColumn("__b0", expr(s"__r_us div ${w}L"))
      .withColumn("__rb", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val l = left.select(
      col(keyCol).as("__lkey"),
      unix_micros(col(tsCol)).as("__l_us"),
      col(idCol).as("__lid"))
      .withColumn("__lb", expr(s"__l_us div ${w}L"))
    val counts = l.join(r,
        col("__lkey") === col("__rkey") && col("__lb") === col("__rb") &&
        col("__r_us") >= col("__l_us") - w && col("__r_us") <= col("__l_us"),
        "left")
      .groupBy(col("__lid"))
      .agg(count(col("__r_us")).as("n_in_window"))
    left.join(counts, col(idCol) === col("__lid"), "left")
      .drop("__lid")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
  }
}

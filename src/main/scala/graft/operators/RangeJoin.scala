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

  /** The pair-producing sibling of [[countInPrecedingWindow]]: one row
    * per (left, right) match with right.ts in [left.ts - windowMicros,
    * left.ts] and equal key. Same 2×-duplication bucket scheme — the
    * bucket id rides in the join key, so heavy keys (power users) still
    * spread across (key, bucket) hash partitions instead of collapsing
    * onto one reducer; a candidate found via both of its buckets is
    * matched exactly once (the bucket equality picks one).
    *
    * Output: `left_id, left_us, key, right_id, right_us` (micros).
    */
  def pairsInPrecedingWindow(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, windowMicros: Long,
      idCol: String = "event_id"): DataFrame = {
    val w = windowMicros
    val r = right.select(
      col(keyCol).as("__rkey"),
      unix_micros(col(tsCol)).as("right_us"),
      col(idCol).as("right_id"))
      .withColumn("__b0", expr(s"right_us div ${w}L"))
      .withColumn("__rb", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val l = left.select(
      col(keyCol).as("key"),
      unix_micros(col(tsCol)).as("left_us"),
      col(idCol).as("left_id"))
      .withColumn("__lb", expr(s"left_us div ${w}L"))
    l.join(r,
        col("key") === col("__rkey") && col("__lb") === col("__rb") &&
        col("right_us") >= col("left_us") - w &&
        col("right_us") <= col("left_us"),
        "inner")
      .select(col("left_id"), col("left_us"), col("key"),
        col("right_id"), col("right_us"))
  }
}

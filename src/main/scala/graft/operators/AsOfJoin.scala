package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row in the same
  * key partition with right.ts <= left.ts.
  *
  * Spark-first design (reference's Jet stream-join surface generalized,
  * cf. /root/reference pipeline/PipelineBuilder.java — the reference has
  * no as-of operator at all): instead of an O(|L|·|R|) inequality join,
  * union both sides into one timeline, shuffle ONCE on the key, and do a
  * sorted window scan with `last(..., ignoreNulls)` — O(1) state per row,
  * no pairwise blow-up. At 100 TB this is a single exchange of |L|+|R|
  * rows; skewed keys are split by AQE.
  */
object AsOfJoin {

  /** Returns `left` with two extra columns:
    *  - `asof_id`: id of the latest right row with right.ts <= left.ts
    *    (ties on ts: the right row counts; among equal right ts, max id)
    *  - `asof_us`: that row's timestamp in epoch microseconds
    * Both null when no right row precedes.
    */
  def lastEventAsOf(left: DataFrame, right: DataFrame,
      partitionCol: String, tsCol: String, idCol: String): DataFrame = {
    val l = left.select(
      col(partitionCol).as("__part"),
      unix_micros(col(tsCol)).as("__us"),
      col(idCol).as("__id"),
      lit(1).as("__side"))
    val r = right.select(
      col(partitionCol).as("__part"),
      unix_micros(col(tsCol)).as("__us"),
      col(idCol).as("__id"),
      lit(0).as("__side"))
    // rights sort before lefts at equal ts so "<=" semantics hold
    val w = Window.partitionBy(col("__part"))
      .orderBy(col("__us").asc, col("__side").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val annotated = l.unionByName(r)
      .withColumn("asof_id",
        last(when(col("__side") === 0, col("__id")), ignoreNulls = true).over(w))
      .withColumn("asof_us",
        last(when(col("__side") === 0, col("__us")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__id").as("__asof_key"), col("asof_id"), col("asof_us"))
    left.join(annotated, col(idCol) === col("__asof_key"), "left")
      .drop("__asof_key")
  }
}

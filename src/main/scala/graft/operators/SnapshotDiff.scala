package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive for lakes
  * without a transaction log: classify every key of two table versions
  * as inserted / deleted / updated / unchanged in ONE full-outer join
  * on the key (shuffle on the key both sides, no driver state).
  * Comparison is null-safe value equality on the shared non-key
  * columns — engine-portable, no engine-specific hashing — so the
  * classification itself is oracle-checkable.
  *
  * At 100 TB: both snapshots shuffle once on the key; with both sides
  * bucketed on the key (`operators.Bucketing`) the exchange disappears
  * and the diff is a zipper scan.
  */
object SnapshotDiff {

  /** (keys..., change) for every key present in either snapshot;
    * `change` ∈ insert | delete | update | unchanged.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = oldDf.columns.filterNot(keys.contains)
      .intersect(newDf.columns).toSeq
    val o = oldDf.select((keys ++ valueCols).map(col): _*)
      .withColumnsRenamed((keys ++ valueCols).map(c => c -> s"__o_$c").toMap)
      .withColumn("__o_present", lit(true))
    val n = newDf.select((keys ++ valueCols).map(col): _*)
      .withColumnsRenamed((keys ++ valueCols).map(c => c -> s"__n_$c").toMap)
      .withColumn("__n_present", lit(true))
    val joinCond = keys.map(k => col(s"__o_$k") <=> col(s"__n_$k"))
      .reduce(_ && _)
    // presence via explicit markers, not key-null-ness — the null-safe
    // join matches null keys, and those rows must still classify right
    val inOld = col("__o_present").isNotNull
    val inNew = col("__n_present").isNotNull
    val allEqual = valueCols.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, joinCond, "full_outer")
      .select(
        (keys.map(k => coalesce(col(s"__o_$k"), col(s"__n_$k")).as(k)) :+
          when(!inOld, lit("insert"))
            .when(!inNew, lit("delete"))
            .when(allEqual, lit("unchanged"))
            .otherwise(lit("update")).as("change")): _*)
  }
}

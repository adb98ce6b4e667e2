package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed/co-located joins (SURVEY.md §5): persist both sides of a
  * recurring large-large join bucketed on the join key and the shuffle
  * disappears from every subsequent join — at 100 TB the dominant cost
  * of a fact-fact join is exactly that exchange. Bucket counts must
  * match (or divide) across tables to co-locate.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — planned as a
    * sort-merge join with NO exchange on either side when bucket
    * specs line up.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    // merge hint: without it a sub-broadcast-threshold side degrades to
    // BroadcastHashJoin and throws away the bucket layout the caller
    // paid a full bucketed write for
    l.join(r.hint("merge"), l(leftKey) === r(rightKey), joinType)
  }
}

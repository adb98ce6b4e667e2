package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact EXCLUSIVE running sum over a global total order at full
  * parallelism — the distributed replacement for
  * `sum(m) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` with an empty
  * PARTITION BY, which funnels every row through ONE task (the same
  * cliff [[RankSelect]] exists for, in scan form).
  *
  * Plan (one LAZY query, all codegen — an RDD two-pass version
  * measured 3.7x slower at sf0.1 from row (de)serialization):
  * range repartition on `orderKeys` (equal keys co-locate, so the
  * partitions tile the order), tag each row with its partition id,
  * roll the per-partition measure totals up to one row per partition,
  * prefix-scan THOSE (an empty-partition window over at most
  * #partitions rows — bounded by cluster parallelism, never by data),
  * broadcast-join the offsets back, and finish with a window
  * PARTITIONED by the bucket id (each bucket an independent task).
  * Both references to the ranged frame are the same exchange subtree,
  * so the shuffle executes once (ReusedExchange) and the range
  * partitioner's deterministic sampling makes the bucketing identical
  * even if it did not.
  *
  * Determinism: the prefix of a row is unique iff `orderKeys` is a
  * total order. Rows that TIE on all keys get an arbitrary relative
  * order — callers needing tie-invariant results should pre-aggregate
  * to one row per key (the MWU tie rollup in q131 does exactly that).
  */
object PrefixSum {

  /** Input schema + `prefixCol` (BIGINT): for each row, the sum of
    * `measureCol` (integral) over all rows strictly before it in the
    * `orderKeys` total order.
    */
  def exclusive(rawDf: DataFrame, measureCol: String, prefixCol: String,
      orderKeys: Column*): DataFrame = {
    // no Parallelism.ensure and no df.rdd probe: the range exchange
    // below redistributes whatever arrives (a single-file scan
    // included), and touching .rdd under AQE EXECUTES the upstream
    // plan eagerly just to read a partition count — measured as 3x
    // the whole query's cost on q131. Bucket count = the session's
    // shuffle parallelism, the same knob every other exchange uses.
    val df = rawDf
    val parts = math.max(
      df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // the bucket frame MUST persist: the offsets branch and the data
    // branch below would otherwise each plan their own range exchange,
    // and two exchanges can sample DIFFERENT partitioner bounds (AQE
    // re-plans them independently) — measured: 13k of 15k prefixes
    // wrong on the q131 rollup. One materialization freezes the
    // bucket ids both consumers read. Released by the caller's
    // GraftSession.release sweep (the repo-wide consumed-twice rule).
    val ranged = df.repartitionByRange(parts, orderKeys: _*)
      .withColumn("__ps_b", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exclBefore = Window.orderBy(col("__ps_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy(col("__ps_b"))
      .agg(sum(col(measureCol)).cast("long").as("__ps_t"))
      .withColumn("__ps_off",
        coalesce(sum(col("__ps_t")).over(exclBefore), lit(0L)))
      .select(col("__ps_b"), col("__ps_off"))
    val inBucket = Window.partitionBy(col("__ps_b")).orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offs), Seq("__ps_b"))
      .withColumn(prefixCol,
        coalesce(sum(col(measureCol)).over(inBucket), lit(0L)).cast("long") +
          col("__ps_off"))
      .drop("__ps_b", "__ps_off")
  }
}

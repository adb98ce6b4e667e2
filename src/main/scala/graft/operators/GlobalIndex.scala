package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Global row numbering at scale. The SQL idiom
  * `row_number() OVER (ORDER BY k)` plans a window with NO partition
  * keys — every row funnels through ONE task, the canonical 100 TB
  * cliff. This operator produces the identical numbering from a range
  * repartition: sort-within-partition plus per-partition row counts
  * (one tiny job), cumulated on the driver into per-partition offsets
  * (a few thousand longs), then offset + local index per row — fully
  * parallel end to end.
  *
  * Determinism: the numbering is unique and reproducible iff the key
  * tuple is a total order (pass a tie-breaker, e.g. a unique id, as the
  * last key) — same contract as the window idiom.
  */
object GlobalIndex {

  /** Append `outCol` = 1-based global rank of the row under `keys`.
    * Equivalent to `row_number() OVER (ORDER BY keys)` without the
    * single-task window.
    */
  def withRowNumber(rawDf: DataFrame, outCol: String, keys: Column*): DataFrame = {
    // single-file parquet tables arrive as ONE partition — spread first
    // or the range exchange itself degenerates to a single task
    val df = Parallelism.ensure(rawDf)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val ranged = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
    // ONE captured RDD feeds both the counts job and the final result:
    // the DAG scheduler skips the completed range-exchange stages on the
    // second materialization (shuffle files are reused), so nothing is
    // persisted and nothing leaks cache for the session
    val rrdd = ranged.rdd
    val counts = rrdd
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(pid) = rows before pid
    val schema = org.apache.spark.sql.types.StructType(
      ranged.schema :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = offsets(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    ranged.sparkSession.createDataFrame(indexed, schema)
  }
}

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
  def withRowNumber(df: DataFrame, outCol: String, keys: Column*): DataFrame = {
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val ranged = df.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*)
    // one lightweight pass: rows per range partition (count only — no
    // data movement beyond the range exchange itself, which the main
    // pass reuses via the persisted frame)
    val persisted = ranged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = persisted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(pid) = rows before pid
    val schema = org.apache.spark.sql.types.StructType(
      persisted.schema :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = persisted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = offsets(pid)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }
    persisted.sparkSession.createDataFrame(indexed, schema)
  }
}

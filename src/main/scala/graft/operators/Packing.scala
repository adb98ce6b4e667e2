package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for pretraining batches: concatenate the corpus in
  * a deterministic order and split it into fixed-capacity context
  * windows (the GPT-style "concat and chunk" packing every large
  * training pipeline runs before tokenized shards are written).
  *
  * Each document gets its token start offset in the global
  * concatenation (an exclusive prefix sum over the total order) and
  * from it the first/last chunk it lands in — all integer arithmetic,
  * so the assignment is bit-reproducible on any engine.
  *
  * Scale: the SQL idiom (`sum(len) OVER (ORDER BY k)`) plans a window
  * with NO partition keys — one task for the whole corpus. Instead:
  * range repartition on the order key, per-partition token totals (one
  * tiny job, O(partitions) longs on the driver), then offset + local
  * running sum per row — fully parallel, same numbers. Mirrors
  * [[GlobalIndex]]; the captured RDD feeds both jobs so the range
  * exchange runs once.
  */
object Packing {

  /** Append `start_tok` (exclusive global prefix sum of `lenCol` under
    * `orderCol`), `chunk_first`, `chunk_last` and `n_chunks` for
    * packing into windows of `capacity` tokens. `orderCol` must be a
    * total order (unique), `lenCol` non-negative integers.
    */
  def packChunks(rawDf: DataFrame, lenCol: String, orderCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val df = Parallelism.ensure(rawDf)
    val parts = math.max(df.rdd.getNumPartitions, 1)
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val lenIdx = ranged.schema.fieldIndex(lenCol)
    def lenOf(r: Row): Long = r.get(lenIdx) match {
      case i: Int => i.toLong
      case l: Long => l
      case other => sys.error(s"$lenCol must be integral, got $other")
    }
    val rrdd = ranged.rdd
    val totals = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      Iterator.single(pid -> it.map(lenOf).sum)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val schema = StructType(ranged.schema
      :+ StructField("start_tok", LongType, nullable = false)
      :+ StructField("chunk_first", LongType, nullable = false)
      :+ StructField("chunk_last", LongType, nullable = false)
      :+ StructField("n_chunks", LongType, nullable = false))
    val packed = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var tok = offsets(pid)
      it.map { r =>
        val len = lenOf(r)
        val start = tok
        tok += len
        // empty docs pack as a zero-width span at their start chunk
        val last = if (len == 0) start else start + len - 1
        val cf = start / capacity
        val cl = last / capacity
        Row.fromSeq(r.toSeq :+ start :+ cf :+ cl :+ (cl - cf + 1))
      }
    }
    ranged.sparkSession.createDataFrame(packed, schema)
  }
}

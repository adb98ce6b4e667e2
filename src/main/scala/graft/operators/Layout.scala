package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the table-maintenance side of a 100 TB lake.
  * Small-file proliferation (streaming sinks, per-task outputs) and
  * unsorted layouts are the two classic scan killers: compaction
  * restores scan-sized files, range-sorted writes give parquet row
  * groups disjoint min/max stats so range predicates skip whole files.
  */
object Layout {

  /** Compact a parquet directory into ~`targetMB` files: file count is
    * computed from the actual on-disk size, so output files land near
    * the target regardless of input fragmentation.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetMB: Int = 128): Long = {
    val df = spark.read.parquet(inDir)
    val bytes = new java.io.File(inDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1L, bytes / (targetMB.toLong * 1024 * 1024)).toInt
    df.repartition(nFiles).write.mode("overwrite").parquet(outDir)
    nFiles.toLong
  }

  /** Range-partitioned, sorted-within-partition write: global order
    * across files AND within each file, so every file covers a disjoint
    * key range — a range predicate prunes to the one file holding it.
    */
  def writeSortedParquet(df: DataFrame, outDir: String, sortCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(outDir)
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction collapses a fragmented directory, data intact") {
    val frag = Files.createTempDirectory("graft_frag").toString
    val out = Files.createTempDirectory("graft_compact").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.repartition(40).write.mode("overwrite").parquet(frag)
    assert(parquetFiles(frag).length == 40)
    Layout.compactParquet(spark, frag, out, targetMB = 128)
    assert(parquetFiles(out).length == 1, "tiny table -> one target-size file")
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("sorted range layout gives files disjoint key ranges") {
    val out = Files.createTempDirectory("graft_sorted").toString
    Layout.writeSortedParquet(
      Tables.load(spark, sf, "documents"), out, "doc_id", nFiles = 4)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4)
    // each file's range ends before the next begins -> row-group stats
    // prune range predicates to a single file
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
  }
}

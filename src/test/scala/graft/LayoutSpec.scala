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

  test("backfill processes only missing partitions, idempotently, with pruned scans") {
    import graft.operators.Backfill
    val src = Files.createTempDirectory("graft_bf_src").toString
    val dst = Files.createTempDirectory("graft_bf_dst").toString + "/out"
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("day", (col("doc_id") % 3).cast("string"))
    docs.filter(col("day") =!= "2")
      .write.mode("overwrite").partitionBy("day").parquet(src)
    // first run: both existing partitions
    val r1 = Backfill.run(spark, src, dst, "day")(df =>
      df.withColumn("n_tokens",
        org.apache.spark.sql.functions.size(split(col("text"), " "))))
    assert(r1 == Seq("0", "1"))
    // nothing new -> no-op
    assert(Backfill.run(spark, src, dst, "day")(identity).isEmpty)
    // a new partition lands -> only it is processed
    docs.filter(col("day") === "2")
      .write.mode("append").partitionBy("day").parquet(src)
    // the pruned read must carry the partition filter
    val pruned = spark.read.parquet(src).filter(col("day").isin("2"))
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    val r3 = Backfill.run(spark, src, dst, "day")(df =>
      df.withColumn("n_tokens",
        org.apache.spark.sql.functions.size(split(col("text"), " "))))
    assert(r3 == Seq("2"))
    assert(spark.read.parquet(dst).count() == docs.count())
  }

  test("z-order keeps BOTH columns' per-file ranges tight; single-sort does not") {
    val out = Files.createTempDirectory("graft_zorder").toString
    val outSorted = Files.createTempDirectory("graft_zsorted").toString
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val nFiles = 16
    Layout.writeZOrderedParquet(li, out, Seq("l_orderkey", "l_partkey"), nFiles)
    Layout.writeSortedParquet(li, outSorted, "l_orderkey", nFiles)
    assert(spark.read.parquet(out).count() == li.count())

    // fraction of files whose [min,max] straddles the column median —
    // the stats a reader consults for skipping
    def straddle(dir: String, c: String): Double = {
      val med = li.stat.approxQuantile(c, Array(0.5), 0.0).head
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(col(c)).cast("double").as("lo"),
          max(col(c)).cast("double").as("hi"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      spans.count { case (lo, hi) => lo <= med && med <= hi }.toDouble / spans.length
    }
    // single-column sort: every file spans all of l_partkey
    assert(straddle(outSorted, "l_partkey") == 1.0)
    // z-order: most files skippable for a point/range predicate on
    // EITHER column
    assert(straddle(out, "l_orderkey") <= 0.5,
      s"l_orderkey straddle ${straddle(out, "l_orderkey")}")
    assert(straddle(out, "l_partkey") <= 0.5,
      s"l_partkey straddle ${straddle(out, "l_partkey")}")
    // empty input must write (degenerate curve), not NPE on null bounds
    val empty = Files.createTempDirectory("graft_zempty").toString
    Layout.writeZOrderedParquet(li.filter(lit(false)), empty,
      Seq("l_orderkey", "l_partkey"), 2)
    assert(spark.read.parquet(empty).count() == 0)
  }
}

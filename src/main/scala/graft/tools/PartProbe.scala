package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch probe: does InMemoryTableScan forward a cached
  * HashPartitioning into a downstream subset-key aggregation?
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i % 50, i % 7)).toDF("dst", "lbl")
      .repartition($"dst").persist()
    df.count()
    // direct agg on the persisted frame
    val agg1 = df.groupBy($"dst", $"lbl").agg(count(lit(1)))
    println("direct agg exchanges: " +
      "Exchange".r.findAllIn(agg1.queryExecution.executedPlan.toString).length)
    // after a broadcast join (the label-prop round shape)
    val side = (0L to 49L).map(i => (i, i * 10)).toDF("dst", "x")
    val agg2 = df.join(broadcast(side), "dst")
      .groupBy($"dst", $"lbl").agg(count(lit(1)))
    println("post-bcast-join agg exchanges: " +
      "Exchange".r.findAllIn(agg2.queryExecution.executedPlan.toString).length)
    // exact-key agg on the cached frame
    val agg3 = df.groupBy($"dst").agg(count(lit(1)))
    println("exact-key agg exchanges: " +
      "Exchange".r.findAllIn(agg3.queryExecution.executedPlan.toString).length)
    // same shapes WITHOUT cache
    val df2 = (1L to 1000L).map(i => (i % 50, i % 7)).toDF("dst", "lbl")
      .repartition($"dst")
    val agg4 = df2.groupBy($"dst", $"lbl").agg(count(lit(1)))
    println("uncached subset-key agg exchanges: " +
      "Exchange".r.findAllIn(agg4.queryExecution.executedPlan.toString).length)
    agg3.explain("formatted")
    // the exact label-prop round shape: edges (src,dst) partitioned by
    // dst, label side keyed on src, join on src, then rollups on dst
    val edges = (1L to 1000L).map(i => (i % 40, i % 50)).toDF("src", "dst")
      .repartition($"dst")
      .groupBy($"src", $"dst").agg(lit(1)).select($"src", $"dst")
      .persist()
    edges.count()
    val labels = (0L to 39L).map(i => (i, i)).toDF("src", "lbl")
    val round = edges.join(broadcast(labels), "src")
      .groupBy($"dst", $"lbl").agg(count(lit(1)).as("cnt"))
      .groupBy($"dst").agg(max(struct($"cnt", (-$"lbl").as("nl"))).as("m"))
    round.explain("formatted")
    spark.stop()
  }
}

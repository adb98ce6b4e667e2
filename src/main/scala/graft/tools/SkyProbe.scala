package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only phase profiler for the q77 skyline chain. */
object SkyProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[skyprobe] $what: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    def li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        $"l_extendedprice".cast("decimal(15,2)").as("price"),
        $"l_quantity".cast("long").as("qty"))
      .withColumn("neg_price", negate($"price"))
    time("warm scan")(li.count())
    time("plain groupBy(qty).max")(li.groupBy($"qty").agg(max($"neg_price")).count())
    time("ensure+groupBy")(graft.operators.Parallelism.ensure(li)
      .groupBy($"qty").agg(max($"neg_price")).count())
    val g = graft.operators.Parallelism.ensure(li).groupBy($"qty").agg(max($"neg_price").as("__ymax"))
    time("grouped.rdd.getNumPartitions")(println("  parts=" + g.rdd.getNumPartitions))
    val ranged = g.repartitionByRange(32, $"qty".desc).sortWithinPartitions($"qty".desc)
    time("ranged partMax job")(ranged.rdd.mapPartitionsWithIndex{case(p,it)=>Iterator.single(p->it.size)}.collect())
    time("full pareto2D")(graft.operators.Skyline.pareto2D(li, "qty", "neg_price").count())
    time("full pareto2D again")(graft.operators.Skyline.pareto2D(li, "qty", "neg_price").count())
    spark.stop()
  }
}

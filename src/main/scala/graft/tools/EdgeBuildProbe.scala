package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time q90's edge build alone (join + distinct + union +
  * repartition + persist) to split build cost from round cost in the
  * 10x probe.
  */
object EdgeBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val orders = graft.Tables.load(spark, dir, "orders")
      val lineitem = graft.Tables.load(spark, dir, "lineitem")
      val cs = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      val edges = cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
        .repartition($"dst").persist()
      val n = edges.count()
      println(f"[edgebuild] pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n edges)")
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }
}

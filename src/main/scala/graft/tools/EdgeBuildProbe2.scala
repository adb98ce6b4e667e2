package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: compare the part co-order edge build forms at sf0.1 —
  * (a) per-order collect_set + row-local pair explode (current q92/q93),
  * (b) SHUFFLE_HASH self-join on l_orderkey (no sort, unlike the
  *     rejected SMJ form).
  */
object EdgeBuildProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def li = graft.Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")

    def collectSetForm() = li.groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey").as("ps"))
      .select(explode(expr(
        "filter(flatten(transform(ps, x -> transform(ps, y -> " +
          "struct(x AS src, y AS dst)))), p -> p.src != p.dst)")).as("p"))
      .select($"p.src".as("src"), $"p.dst".as("dst"))
      .repartition($"dst")
      .groupBy($"src", $"dst").agg(lit(1))
      .select($"src", $"dst")

    def selfJoinForm() = {
      val a = li.select($"l_orderkey", $"l_partkey".as("src"))
      val b = li.select($"l_orderkey", $"l_partkey".as("dst"))
      a.hint("SHUFFLE_HASH").join(b.hint("SHUFFLE_HASH"), Seq("l_orderkey"))
        .filter($"src" =!= $"dst")
        .select($"src", $"dst")
        .repartition($"dst")
        .groupBy($"src", $"dst").agg(lit(1))
        .select($"src", $"dst")
    }

    Seq("collect_set" -> (() => collectSetForm()),
        "self_join" -> (() => selfJoinForm())).foreach { case (name, f) =>
      f().count() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[edge2] $name: min ${times.map(_._1).min}%.2f s (${times.head._2} edges)")
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }
}

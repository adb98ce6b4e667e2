package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage-attribution probe for corpus_prepare_fuzzy
  * (round 20): times gate / pair-build / CC / survivor-rollup stages
  * separately.
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.GraftFunctions._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fz] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 3).foreach { round =>
      println(s"[fz] === round $round ===")
      val gated = graft.Tables.load(spark, sfDir, "documents")
        .withColumn("n_tokens", token_count(col("text")))
        .withColumn("stop_cnt", stopword_count(col("text")))
        .withColumn("mean_word_len",
          (length($"text") - ($"n_tokens" - 1)).cast("double") / $"n_tokens")
        .filter($"n_tokens" >= 20 &&
          $"mean_word_len" >= 3.0 && $"mean_word_len" <= 12.0 &&
          $"stop_cnt" * 100 >= $"n_tokens" * 2)
        .select($"doc_id", $"lang", $"text", $"n_chars")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("gate persist")(gated.count())
      val pairs = graft.operators.Dedup.simhashComponentPairs(
        gated.withColumn("__ws", words($"text")), "doc_id", "__ws",
        maxHamming = 3)
      time("pairs count")(pairs.count())
      val comp = graft.operators.Dedup.connectedComponents(
        gated.select($"doc_id".as("id"), $"lang", $"n_chars"), pairs)
      time("cc count")(comp.count())
      val byComponent = Window.partitionBy($"component")
      val surv = comp
        .withColumn("__rn", row_number().over(byComponent
          .orderBy($"n_chars".desc, $"id".asc)))
        .filter($"__rn" === 1)
        .select($"lang", $"n_chars")
      val fin = gated.groupBy($"lang").agg(count(lit(1)).as("n_gated"))
        .join(surv.groupBy($"lang").agg(count(lit(1)).as("n_survivors"),
          sum($"n_chars").as("survivor_chars")), Seq("lang"))
      time("rollup")(fin.count())
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }
}

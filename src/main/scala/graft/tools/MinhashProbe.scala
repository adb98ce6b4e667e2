package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Parallelism}
import graft.functions.GraftFunctions._

/** Dev-only phase profiler for the MinHash LSH dedup chain (not part of
  * the driver contract): isolates signature computation, banding join,
  * and the full pipeline so regressions localize.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[mhprobe] $what: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
    def full() = Dedup.minhashPairsText(docs, "doc_id", "text",
      mode = "word", n = 3, numHashes = 128, bands = 32,
      tauNum = 1, tauDen = 2).count()
    time("full cold")(full())
    spark.catalog.clearCache()
    time("full warm")(full())
    spark.catalog.clearCache()
    val sigs = time("signatures only") {
      val s = Parallelism.ensure(docs).select(col("doc_id").as("__id"),
        minhash_sig_text(col("text"), "word", 3, 128).as("__sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val banded = sigs.select(col("__id"),
      explode(minhash_bands(col("__sig"), 32)).as("__band"))
    val cands = time("band self-join + distinct") {
      val c = banded.as("x").join(banded.as("y"),
          col("x.__band") === col("y.__band") && col("x.__id") < col("y.__id"))
        .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("[mhprobe] candidates: " + c.count()); c
    }
    time("prefilter (sig agreement)") {
      val n = cands
        .join(sigs.select(col("__id").as("id_a"), col("__sig").as("__ga")), "id_a")
        .join(sigs.select(col("__id").as("id_b"), col("__sig").as("__gb")), "id_b")
        .filter(expr("aggregate(zip_with(__ga, __gb, (x, y) -> if(x = y, 1, 0)), " +
          "0, (a, b) -> a + b) >= 43"))
        .count()
      println("[mhprobe] prefiltered: " + n)
    }
    spark.stop()
  }
}

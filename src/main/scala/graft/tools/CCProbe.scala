package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.GraftFunctions._

/** Dev-only phase profiler for dedup_clusters (not part of the driver
  * contract): splits simhash-pair building from the CC loop.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[ccprobe] $what: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("__ws", words(col("text")))
    time("full cold") {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "__ws", maxHamming = 3)
      Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs).count()
    }
    spark.catalog.clearCache()
    time("full warm") {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "__ws", maxHamming = 3)
      Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairs).count()
    }
    spark.catalog.clearCache()
    time("simhashPairs alone") {
      Dedup.simhashPairs(docs, "doc_id", "__ws", maxHamming = 3).count()
    }
    spark.catalog.clearCache()
    val pairsCk = Dedup.simhashPairs(docs, "doc_id", "__ws", maxHamming = 3)
      .localCheckpoint()
    println("[ccprobe] edges: " + pairsCk.count())
    time("CC alone (pairs pre-materialized)") {
      Dedup.connectedComponents(docs.select(col("doc_id").as("id")), pairsCk).count()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.GraftFunctions._

/** Dev-only structure probe for the survivor-fold re-plan (round 16):
  * on the prior-crawl half of `documents`, measures the band-bucket
  * graph a greedy keep-first fold must traverse — bucket size
  * distribution, candidate-star component sizes (bucket-min stars:
  * linear to emit, but do spurious collisions merge them into a giant
  * component?), verified pair count and verified component sizes —
  * to decide whether per-component in-memory sweeps are viable.
  */
object SurvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[survprobe] $what: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) DIV 2")).head().getLong(0)
    val half = docs.filter(col("doc_id") <= mid)
    val sigs = graft.operators.Parallelism.ensure(half)
      .select(col("doc_id").as("id"), minhash_sig_text(col("text"), "word", 3, 128).as("sig"))
      .persist()
    println("[survprobe] docs = " + sigs.count())
    val banded = sigs.select(col("id"), explode(minhash_bands(col("sig"), 64)).as("__band"))
      .persist()
    println("[survprobe] band rows = " + banded.count())
    val buckets = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("m"), min(col("id")).as("bmin")).persist()
    time("bucket stats") {
      buckets.agg(count(lit(1)).as("buckets"),
        max(col("m")).as("max_bucket"),
        sum(col("m") * (col("m") - 1) / 2).as("cand_pairs_with_mult"),
        sum(when(col("m") > 1, col("m")).otherwise(0)).as("rows_in_multi"))
        .show(false)
    }
    // candidate star: member -> bucket min (linear in band rows)
    val star = banded.join(buckets.select(col("__band"), col("bmin")), "__band")
      .filter(col("id") =!= col("bmin"))
      .select(col("bmin").as("id_a"), col("id").as("id_b")).distinct()
      .persist()
    println("[survprobe] star edges = " + star.count())
    val candComp = time("cc over candidate stars") {
      Dedup.connectedComponents(sigs.select(col("id")), star).persist()
    }
    candComp.groupBy(col("component")).count()
      .agg(count(lit(1)), max(col("count")), expr("percentile(count, 0.999)"))
      .show(false)
    val verified = time("sigEstimatePairs (verified)") {
      Dedup.sigEstimatePairs(sigs, 128, 64, 1, 2).persist()
    }
    println("[survprobe] verified pairs = " + verified.count())
    val verComp = time("cc over verified") {
      Dedup.connectedComponents(sigs.select(col("id")), verified).persist()
    }
    verComp.groupBy(col("component")).count()
      .agg(count(lit(1)), max(col("count")), expr("percentile(count, 0.999)"))
      .show(false)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Dev harness: candidate-volume scaling of Dedup.embeddingPairsCells.
  *
  * Compares the cell-restricted candidate count against the all-pairs
  * n(n-1)/2 at 1x (sf0.1 embeddings) and 10x (replicated), with the
  * centroid count scaling as k = ceil(sqrt(n)) — the sizing rule under
  * which candidate volume is O(nprobe² · n^1.5), i.e. SUBQUADRATIC:
  * 10x rows should grow candidates ~10^1.5 ≈ 32x, not 100x. Candidates
  * are counted by running the real operator with tau = -1 (cosine >= -1
  * never filters), so the number measured is the number the verify
  * stage actually scores. Writes only under /tmp.
  */
object CellsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def probe(label: String, emb: org.apache.spark.sql.DataFrame): Unit = {
      val cached = emb.persist()
      val n = cached.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val centroids = Similarity.ivfFit(cached, "embedding", k)
      val t0 = System.nanoTime()
      val cands = Dedup.embeddingPairsCells(
        cached, "vec_id", "embedding", centroids, tau = -1.0).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val allPairs = n * (n - 1) / 2
      println(f"CELLS $label n=$n k=$k cands=$cands allpairs=$allPairs " +
        f"frac=${cands.toDouble / allPairs}%.4f time=$dt%.2f s")
      graft.GraftSession.release(spark)
    }

    probe("1x", base)
    val rep = (0 until 10).map { c =>
      base.withColumn("vec_id", col("vec_id") + lit(c.toLong * 100000000L))
    }.reduce(_ unionByName _)
    probe("10x", rep)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 10): duplicate-density shape of the pair-graph
  * queries at 1x vs 10x — distinct phash / simhash counts vs row
  * counts, and the banded candidate-pair volume with and without
  * collapsing hash-identical members first. Run:
  * SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.DupDensityProbe"
  */
object DupDensityProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // phash side (mm_dedup shape)
    val media = graft.operators.Parallelism.ensure(
      graft.multimodal.Multimodal.fromDocuments(
        graft.Tables.load(spark, sfDir, "documents")))
    val ph = graft.multimodal.Multimodal.perceptualHash(media).toDF()
      .select($"media_id", $"phash").persist()
    val nImg = ph.count()
    val nHash = ph.select($"phash").distinct().count()
    val grp = ph.groupBy($"phash").agg(count(lit(1)).as("k"))
    val topG = grp.orderBy($"k".desc).limit(5).collect()
      .map(r => r.getLong(1)).mkString(",")
    val pairVolume = grp.agg(sum($"k" * ($"k" - 1))).head().getLong(0) / 2
    println(s"[probe] images=$nImg distinct_phash=$nHash " +
      s"identical-pair-volume=$pairVolume top-groups=[$topG]")

    // simhash side (dedup_clusters shape)
    import graft.functions.GraftFunctions._
    val docs = graft.operators.Parallelism.ensure(
      graft.Tables.load(spark, sfDir, "documents"))
      .select($"doc_id", simhash60(words($"text")).as("sh")).persist()
    val nDoc = docs.count()
    val nSh = docs.select($"sh").distinct().count()
    val sgrp = docs.groupBy($"sh").agg(count(lit(1)).as("k"))
    val sTop = sgrp.orderBy($"k".desc).limit(5).collect()
      .map(r => r.getLong(1)).mkString(",")
    val sPairs = sgrp.agg(sum($"k" * ($"k" - 1))).head().getLong(0) / 2
    println(s"[probe] docs=$nDoc distinct_simhash=$nSh " +
      s"identical-pair-volume=$sPairs top-groups=[$sTop]")
    spark.stop()
  }
}

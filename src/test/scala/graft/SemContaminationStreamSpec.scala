package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Contamination
import graft.streaming.StreamingOps

/** Round 19 (VERDICT r18 task 3): streaming SEMANTIC decontamination.
  * The bench + centroid sides are FIXED and the cell-blocked cosine
  * screen is row-local against them, so per-batch screen + union must
  * equal the one-pass batch screenSemantic in any split; re-delivery
  * refuses via the shared guard.
  */
class SemContaminationStreamSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding")).persist()

  // bench = every ~40th vector (planted exact-duplicate leakage: a
  // vector IS its own paraphrase at cosine 1)
  private lazy val bench = emb.filter(col("vec_id") % 40 === 0)
    .select(col("vec_id"), col("embedding")).persist()

  private lazy val centroids = {
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv")).persist()
  }

  private def canon(df: DataFrame) =
    df.select(col("vec_id"), col("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("streamed two-batch semantic screen state == one-pass batch screenSemantic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sctm").toString
    val mid = emb.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    emb.filter(col("vec_id") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.semContaminationMaintained(
      stream, "vec_id", "embedding", bench, centroids, 0.95,
      s"$dir/state", "sctm_spec")
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") > mid).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2)
    val streamed = canon(StreamingOps.latestState(spark, s"$dir/state").get)
    val batch = canon(Contamination.screenSemantic(
      emb, bench, "vec_id", "embedding", centroids, 0.95))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed semantic screen diverged (${streamed.size} vs " +
        s"${batch.size} rows)")
    // the planted bench vectors themselves screen as hit (cosine 1
    // with themselves, same cell by construction)
    val hitIds = streamed.filter(_._2 > 0).map(_._1).toSet
    val planted = bench.select(col("vec_id")).collect().map(_.getLong(0))
    assert(planted.forall(hitIds.contains),
      "a planted bench vector screened clean — the screen is broken")
    assert(streamed.exists(_._2 == 0), "every vector contaminated")
    GraftSession.release(spark)
  }

  test("a re-delivered vec_id refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sctmr").toString
    val lo = emb.filter(col("vec_id") < 100)
    lo.coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.semContaminationMaintained(
      stream, "vec_id", "embedding", bench, centroids, 0.95,
      s"$dir/state", "sctm_re_spec")
    try {
      q.processAllAvailable()
      lo.filter(col("vec_id") < 50).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("already screened") ||
        Option(e.getCause).exists(_.getMessage.contains("already screened")),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
    GraftSession.release(spark)
  }
}

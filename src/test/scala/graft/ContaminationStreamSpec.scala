package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Contamination
import graft.streaming.StreamingOps

/** Round 18 (VERDICT r17 task 6): streaming decontamination. The
  * benchmark side is FIXED, the screen is row-local against it, so
  * per-batch screen + union must equal the one-pass batch screen in
  * any split; a re-delivered doc id refuses loudly.
  */
class ContaminationStreamSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text")).persist()

  // a real benchmark slice: every ~40th doc's text — planted overlap
  private lazy val bench = docs.filter(col("doc_id") % 40 === 0)
    .select(col("text")).persist()

  private def canon(df: DataFrame) =
    df.select(col("doc_id"), col("n_hit"), col("n_grams"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("streamed two-batch screen state == one-pass batch screen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctm").toString
    val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
      .cast("long")).head().getLong(0)
    docs.filter(col("doc_id") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.contaminationMaintained(
      stream, "doc_id", "text", bench, 5, s"$dir/state", "ctm_spec")
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > mid).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2)
    val streamed = canon(StreamingOps.latestState(spark, s"$dir/state").get)
    val batch = canon(Contamination.screen(docs, bench, "doc_id", "text", 5))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed screen diverged (${streamed.size} vs ${batch.size} rows)")
    // the planted benchmark docs themselves screen as fully hit
    assert(streamed.exists(t => t._2 > 0 && t._2 == t._3),
      "no fully-contaminated doc found — bench planting broken")
    assert(streamed.exists(_._2 == 0), "every doc contaminated")
    GraftSession.release(spark)
  }

  test("a re-delivered doc id refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctmr").toString
    val lo = docs.filter(col("doc_id") < 100)
    lo.coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.contaminationMaintained(
      stream, "doc_id", "text", bench, 5, s"$dir/state", "ctm_re_spec")
    try {
      q.processAllAvailable()
      lo.filter(col("doc_id") < 50).coalesce(1)
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

package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.streaming.StreamingOps

/** The streaming quality-audit contract: per-batch audits SUM to the
  * whole-history audit (row-local rules are additive — arithmetic, not
  * an arrival-order contract), and the maintained state harness folds
  * a two-file stream to exactly the one-pass batch audit.
  */
class QualityStreamSpec extends SparkSpec {

  private val rules = Seq(
    Quality.NotNull("text"), Quality.NonEmpty("text"),
    Quality.InSet("lang", Seq("en", "de", "fr")),
    Quality.Bounds("n_chars", 0, 500))

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

  test("unique rule is refused — not additive across batches") {
    val e = intercept[IllegalArgumentException] {
      StreamingOps.qualityAuditMaintained(docs,
        Seq(Quality.Unique("doc_id")), "/tmp/never", "refuse")
    }
    assert(e.getMessage.contains("row-local"))
  }

  test("streamed two-file audit equals the one-pass batch audit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qstream").toString
    val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
      .cast("long")).head().getLong(0)
    docs.filter(col("doc_id") <= mid).coalesce(1).write.parquet(s"$dir/in/b0")
    docs.filter(col("doc_id") > mid).coalesce(1).write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.qualityAuditMaintained(
      stream, rules, s"$dir/state", "q_stream_spec")
    try q.processAllAvailable() finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2)
    val got = StreamingOps.latestState(spark, s"$dir/state").get
    val want = Quality.audit(docs, rules)
    val cols = ("n_rows" +: rules.map(_.name)).map(col)
    assert(got.select(cols: _*).collect().toSeq ==
      want.select(cols: _*).collect().toSeq,
      "cumulative streamed audit diverged from the batch audit")
    // at least one rule must have a non-zero count for the test to
    // mean anything (Bounds(0,500) is violated by the corpus' longer
    // docs), and the totals must cover every row
    val row = want.head()
    assert(row.getAs[Long]("n_rows") == docs.count())
    assert(rules.map(r => row.getAs[Long](r.name)).exists(_ > 0L),
      "all rules read zero violations — assertions vacuous on this data")
    GraftSession.release(spark)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup
import graft.streaming.StreamingOps

/** Round 17 (VERDICT r16 task 5): the incremental line-dedup owner
  * fold. min(struct(doc_id, pos)) per distinct line is idempotent and
  * commutative, so the streamed owner state equals the batch
  * lineOwners over everything — in ANY arrival order (no id-order
  * contract, unlike the minhash folds) — and reading survivors
  * through dedupFromOwners reproduces batch dedupLines exactly.
  */
class LineDedupStreamSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("clean_text"), col("n_lines"),
        col("n_kept"), col("n_removed"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("streamed owner state == batch dedupLines, even OUT of id order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lds").toString
    // lines = sentences, plus a planted boilerplate header on every
    // doc — the repeated navigation chrome line dedup exists to kill
    // (the corpus' own sentences don't repeat verbatim cross-doc)
    val lined = docs.withColumn("text",
      concat(lit("SITE NAV | HOME | ABOUT\n"),
        regexp_replace(col("text"), "\\. ", ".\n")))
    val mid = lined.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
      .cast("long")).head().getLong(0)
    // LARGER ids stream FIRST — the fold must not care
    lined.filter(col("doc_id") > mid).coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(lined.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.lineOwnersMaintained(
      stream, "doc_id", "text", s"$dir/state", "line_owner_spec")
    try {
      q.processAllAvailable()
      lined.filter(col("doc_id") <= mid).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2)
    val owners = StreamingOps.latestState(spark, s"$dir/state").get
    val streamed = canon(SpanDedup.dedupFromOwners(
      SpanDedup.lineOcc(lined, "doc_id", "text"), owners))
    val batch = canon(SpanDedup.dedupLines(lined, "doc_id", "text"))
    assert(streamed == batch,
      "streamed owner state diverged from the batch dedupLines split")
    // the state is the distinct-line dictionary
    assert(owners.count() ==
      SpanDedup.lineOcc(lined, "doc_id", "text")
        .select(col("line")).distinct().count())
    // the corpus must actually share lines across docs or this test
    // proves nothing
    val removed = batch.map(_._5).sum
    assert(removed > 0, "no cross-doc duplicate lines in the fixture")
    GraftSession.release(spark)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Transforms}
import graft.pipeline.TransformSpec

/** The incremental (cross-snapshot) neardedup BATCH stage: sequential
  * snapshot folds reproduce the one-shot fold's survivor set, the
  * state versions accumulate, a replayed crawl refuses via the
  * id-order guard, and divergent banding refuses via the params pin.
  */
class SnapshotStageSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text")).persist()

  private def ndSpec(stateDir: String, extra: (String, Any)*) =
    TransformSpec("neardedup", Map[String, Any](
      "id" -> "doc_id", "text" -> "text", "orderBy" -> "doc_id",
      "stateDir" -> stateDir) ++ extra)

  test("two sequential snapshot stages equal the one-shot fold's survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) DIV 2"))
      .head().getLong(0)
    val s1 = Transforms.apply(docs.filter(col("doc_id") <= mid),
      Seq(ndSpec(s"$dir/state")))
    val s2 = Transforms.apply(docs.filter(col("doc_id") > mid),
      Seq(ndSpec(s"$dir/state")))
    val got = (s1.select(col("doc_id")).collect() ++
      s2.select(col("doc_id")).collect()).map(_.getLong(0)).sorted.toSeq
    val want = Dedup.minhashDedupFold(None, docs, "doc_id", "text")
      .filter(!col("is_dup")).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want)
    // two committed state versions, newest holds every doc's decision
    assert(StreamingOps.stateVersions(spark, s"$dir/state") === Seq(0L, 1L))
    assert(StreamingOps.latestState(spark, s"$dir/state").get.count() ===
      docs.count())
    GraftSession.release(spark)
  }

  test("replay/ordering/banding/ownership guards hold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_r").toString
    val first = Transforms.apply(docs, Seq(ndSpec(s"$dir/state")))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    // an EXACT re-run of the newest crawl (a sink failure after the
    // state committed, or a plan built twice) is IDEMPOTENT: same
    // survivors back, nothing double-folds, no new version
    val again = Transforms.apply(docs, Seq(ndSpec(s"$dir/state")))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(again === first)
    assert(StreamingOps.stateVersions(spark, s"$dir/state") === Seq(0L))
    // a PARTIAL overlap is a genuine ordering violation -> refusal
    val e = intercept[IllegalStateException] {
      StreamingOps.minhashDedupSnapshot(
        docs.limit(10), "doc_id", "text", s"$dir/state")
    }
    assert(e.getMessage.contains("non-decreasing id order"), e.getMessage)
    // a strict SUFFIX-SUBSET of the newest crawl (batch {11} after
    // crawl {10,11}) is partial overlap, NOT a replay: the version's
    // _crawl_min marker compares against the FULL crawl id set
    // (round 14 — ADVICE r13 finding 2)
    val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) DIV 2"))
      .head().getLong(0)
    val e1b = intercept[IllegalStateException] {
      StreamingOps.minhashDedupSnapshot(
        docs.filter(col("doc_id") > mid), "doc_id", "text", s"$dir/state")
    }
    assert(e1b.getMessage.contains("non-decreasing id order"), e1b.getMessage)
    assert(StreamingOps.stateVersions(spark, s"$dir/state") === Seq(0L))
    // a later snapshot under different banding is refused by the pin
    val e2 = intercept[IllegalStateException] {
      StreamingOps.minhashDedupSnapshot(
        docs.select(col("doc_id") + 1000000L as "doc_id", col("text")),
        "doc_id", "text", s"$dir/state", tauNum = 7, tauDen = 8)
    }
    assert(e2.getMessage.contains("_minhash_params"), e2.getMessage)
    // the incremental stage demands the ascending-id survivor order
    intercept[IllegalArgumentException] {
      Transforms.apply(docs, Seq(TransformSpec("neardedup",
        Map[String, Any]("id" -> "doc_id", "text" -> "text",
          "orderBy" -> "doc_id DESC", "stateDir" -> s"$dir/state2"))))
    }
    GraftSession.release(spark)
  }

  test("one harness per state dir: snapshot refuses a stream's dir and vice versa") {
    // a dir carrying a streaming _checkpoint: snapshot versioning
    // (last+1) would collide with the stream's batch-id versions
    val sdir = java.nio.file.Files.createTempDirectory("graft_snap_o").toString
    new java.io.File(s"$sdir/state/_checkpoint").mkdirs()
    val e = intercept[IllegalStateException] {
      StreamingOps.minhashDedupSnapshot(docs, "doc_id", "text",
        s"$sdir/state")
    }
    assert(e.getMessage.contains("STREAMING fold"), e.getMessage)
    // a snapshot-owned dir: a stream folding over it would read the
    // last+1 versions as already-folded batch ids and skip data
    val sdir2 = java.nio.file.Files.createTempDirectory("graft_snap_o2").toString
    Transforms.apply(docs, Seq(ndSpec(s"$sdir2/state")))
    docs.coalesce(1).write.parquet(s"$sdir2/in/b0")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$sdir2/in/*")
    val q = StreamingOps.minhashDedupMaintained(
      stream, "doc_id", "text", s"$sdir2/state", "snap_owned_spec")
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e2.getMessage.contains("minhashDedupSnapshot") ||
      Option(e2.getCause).exists(_.getMessage.contains("minhashDedupSnapshot")),
      e2.getMessage)
    GraftSession.release(spark)
  }
}

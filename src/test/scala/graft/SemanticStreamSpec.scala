package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Dedup

/** The incremental semantic-dedup contract (SemDeDup streaming): with a
  * FIXED centroid frame, folding in-order batches produces EXACTLY the
  * state one fold over everything would — cell assignment is
  * batch-local (broadcast centroids, no history dependence) and each
  * is_dup decision (same cell, smaller id, cosine >= tau) is
  * arrival-immutable and split-invariant.
  */
class SemanticStreamSpec extends SparkSpec {

  private val Tau = 0.3 // sf0.001 same-label pairs: 82 at >= 0.3 (probed)

  private def canon(df: DataFrame) =
    df.select(col("id"), col("cell"), col("is_dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  private lazy val vecs = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding")).persist()
  // deterministic centroids: lowest-vec_id member per label (the
  // dedup_semantic convention; ivfFit k-means at scale)
  private lazy val centroids = {
    val wc = Window.partitionBy(col("label")).orderBy(col("vec_id").asc)
    Tables.load(spark, sf, "embeddings")
      .withColumn("__rn", row_number().over(wc)).filter(col("__rn") === 1)
      .select(col("label").cast("long").as("cid"), col("embedding").as("cv"))
      .persist()
  }
  private lazy val full = canon(Dedup.semanticDedupFold(
    None, vecs, "vec_id", "embedding", centroids, Tau))

  test("the single-fold state flags within-cell near-dups") {
    assert(full.nonEmpty)
    assert(full.exists(_._3), "no semantic dups at tau=0.3 — probe said 82 pairs")
    assert(full.exists(!_._3), "everything flagged — tau too low")
  }

  test("in-order id splits fold to the single-fold state") {
    val ids = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    for (cuts <- Seq(Seq(ids(ids.length / 2)),
        Seq(ids(ids.length / 3), ids(2 * ids.length / 3)))) {
      val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue))
        .sliding(2).toSeq
      val state = bounds.foldLeft(Option.empty[DataFrame]) { case (prev, Seq(a, b)) =>
        val batch = vecs.filter(col("vec_id") > a && col("vec_id") <= b)
        Some(Dedup.semanticDedupFold(
          prev, batch, "vec_id", "embedding", centroids, Tau).persist())
      }
      assert(canon(state.get) == full, s"fold over cuts $cuts diverged")
    }
    GraftSession.release(spark)
  }

  test("the per-batch probe broadcasts the batch side — history never shuffles") {
    val ids = vecs.select(col("vec_id")).orderBy(col("vec_id"))
      .collect().map(_.getLong(0))
    val mid = ids(ids.length / 2)
    val prev = Dedup.semanticDedupFold(None,
      vecs.filter(col("vec_id") <= mid), "vec_id", "embedding",
      centroids, Tau).persist()
    prev.count()
    val next = Dedup.semanticDedupFold(Some(prev),
      vecs.filter(col("vec_id") > mid), "vec_id", "embedding",
      centroids, Tau)
    val p = next.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the cell probe must broadcast the batch side")
    assert(!p.contains("SortMergeJoin"),
      "history must stream through the probe without a sort-merge exchange")
    GraftSession.release(spark)
  }

  test("semanticDedupMaintained streams two files into the single-fold state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_semstream").toString
    val mid = vecs.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    vecs.filter(col("vec_id") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    vecs.filter(col("vec_id") > mid).coalesce(1)
      .write.parquet(s"$dir/in/b1")
    val stream = spark.readStream
      .schema(vecs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = graft.streaming.StreamingOps.semanticDedupMaintained(
      stream, "vec_id", "embedding", centroids, Tau,
      s"$dir/state", "sem_stream_spec")
    try q.processAllAvailable() finally q.stop()
    val finalState = graft.streaming.StreamingOps
      .latestState(spark, s"$dir/state").get
    assert(canon(finalState) == full)
    GraftSession.release(spark)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.StreamingOps

/** The streaming ANN/IVF index-manifest contract: per-cell foldable
  * statistics (additive counts, struct-min keeper, below-tau extremes)
  * reconstruct EXACTLY the batch ann_prepare manifest — for ANY batch
  * split in ANY interleaving (split-invariance is arithmetic here: the
  * keep-worst keeper is min(struct(cos, id)), and cosines are
  * batch-local against the fixed broadcast centroids). This is the
  * vector-stack member of the versionedStateSink family.
  */
class AnnManifestStreamSpec extends SparkSpec {

  private val Tau = 0.25 // the ann_prepare operating point

  private lazy val vecs = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding")).persist()
  private lazy val centroids = {
    val wc = Window.partitionBy(col("label")).orderBy(col("vec_id").asc)
    Tables.load(spark, sf, "embeddings")
      .withColumn("__rn", row_number().over(wc)).filter(col("__rn") === 1)
      .select(col("label").cast("long").as("cid"), col("embedding").as("cv"))
      .persist()
  }

  /** The batch truth: the ann_prepare manifest computed directly
    * (assignment -> keep-worst keeper -> flag -> per-cell rollup).
    */
  private lazy val batchManifest: Seq[Row] = {
    val assigned = vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(graft.functions.GraftFunctions.cosine_sim(
            col("embedding"), col("cv")).as("cos_c"),
          (lit(0L) - col("cid")).as("negcid")).as("m"))
      .groupBy(col("vec_id")).agg(max(col("m")).as("m"))
      .select(col("vec_id"), (lit(0L) - col("m.negcid")).as("cid"),
        col("m.cos_c").as("cos_c"))
      .persist()
    val keepers = assigned.filter(col("cos_c") >= Tau)
      .groupBy(col("cid"))
      .agg(min(struct(col("cos_c"), col("vec_id"))).as("k"))
      .select(col("cid"), col("k.vec_id").as("keep_vec"))
    val flagged = assigned.join(broadcast(keepers), Seq("cid"), "left")
      .withColumn("keep", col("cos_c") < Tau || col("vec_id") === col("keep_vec"))
    canon(flagged.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        min(when(col("keep"), col("cos_c"))).as("min_cos_kept"),
        max(when(col("keep"), col("cos_c"))).as("max_cos_kept"),
        min(when(col("keep"), col("vec_id"))).as("min_vec_kept"),
        max(when(col("keep"), col("vec_id"))).as("max_vec_kept")))
  }

  private case class Row(cid: Long, n: Long, kept: Long, dropped: Long,
      minC: Double, maxC: Double, minV: Long, maxV: Long)
  private def canon(df: DataFrame): Seq[Row] =
    df.select(col("cid"), col("n_assigned"), col("n_kept"), col("n_dropped"),
        col("min_cos_kept"), col("max_cos_kept"),
        col("min_vec_kept"), col("max_vec_kept"))
      .collect().map(r => Row(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getLong(7)))
      .sortBy(_.cid).toSeq

  test("streamed per-cell state reconstructs the batch manifest bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annman").toString
    // INTERLEAVED split (vec_id % 3) — unlike the dedup folds there is
    // no in-order arrival contract to honor, and the spec proves it
    for (k <- 0 until 3)
      vecs.filter(col("vec_id") % 3 === k).coalesce(1)
        .write.parquet(s"$dir/in/b$k")
    val stream = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.annManifestMaintained(
      stream, "vec_id", "embedding", centroids, Tau,
      s"$dir/state", "ann_manifest_spec")
    try q.processAllAvailable() finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    // state is k rows — bounded by the cell count, not the stream length
    assert(state.count() <= centroids.count())
    val streamed = canon(StreamingOps.annManifest(state))
    assert(streamed.nonEmpty && streamed == batchManifest)
    GraftSession.release(spark)
  }

  test("the manifest actually exercises both branches (dups and singletons)") {
    assert(batchManifest.exists(_.dropped > 0),
      s"no cell dropped anything at tau=$Tau — threshold too high for the spec")
    assert(batchManifest.forall(r => r.kept + r.dropped == r.n))
    GraftSession.release(spark)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamingOps

/** Round 17 (VERDICT r16 task 2): incremental k-NN-graph maintenance.
  * A vector's candidate set (stored members of its probed cells) only
  * grows, so keeping the current top-degree edges and merging each
  * batch's new candidates is a sound monotone fold — the streamed
  * graph must equal the batch Similarity.knnGraph build edge for edge
  * (cosines bit-equal: row-local strict folds on identical inputs),
  * in ANY arrival order.
  */
class KnnGraphStreamSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private lazy val centroids = {
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv")).persist()
  }

  private def canon(df: org.apache.spark.sql.DataFrame,
      idName: String) =
    df.select(col(idName), col("nbr_id"), col("cos"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("streamed graph == batch knnGraph on an interleaved, order-reversed split") {
    val dir = java.nio.file.Files.createTempDirectory("graft_knng").toString
    // interleave by parity AND stream the high half first — the fold
    // claims arithmetic split-invariance, so make the split adversarial
    emb.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.knnGraphMaintained(
      stream, "vec_id", "embedding", centroids, s"$dir/state",
      "knng_spec", degree = 3, nprobe = 2)
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") % 2 === 0).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2,
      "expected two folded micro-batches")
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    val streamed = canon(StreamingOps.knnGraphCurrent(state), "id")
    val batch = canon(Similarity.knnGraph(
      emb, "vec_id", "embedding", centroids, degree = 3, nprobe = 2),
      "vec_id")
    assert(streamed.nonEmpty, "empty streamed graph")
    assert(streamed == batch,
      s"streamed graph diverged from batch (sizes ${streamed.size} vs " +
        s"${batch.size})")
    // state carries one member row per vector beside the edges
    assert(state.filter(col("kind") === "v").count() == emb.count())

    // ...and THROUGH THE WALK (round 18 — VERDICT r17 task 3): beam
    // search over the MAINTAINED graph == beam search over the batch
    // build, bit-equal frontiers. This is the amortized consumer — the
    // state read replaces the n^1.5 rebuild.
    def canonFrontier(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // centroid entry: centroids are corpus vectors, hence graph members
    val wE = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("ec").desc, col("node").asc)
    val seed = queries.crossJoin(broadcast(centroids))
      .select(col("q_id"),
        col("cid").as("node"),
        graft.functions.GraftFunctions.cosine_sim(col("qv"), col("cv"))
          .as("ec"))
      .withColumn("__rn", row_number().over(wE)).filter(col("__rn") <= 4)
      .select(col("q_id"), col("node"), col("ec").as("ncos"))
      .persist()
    val mFinal = canonFrontier(Similarity.graphBeamSearch(
      StreamingOps.knnGraphMembers(state),
      StreamingOps.knnGraphCurrent(state)
        .select(col("id").as("src"), col("nbr_id").as("dst")),
      queries, seed, width = lit(4), steps = 3))
    val bFinal = canonFrontier(Similarity.graphBeamSearch(
      emb.select(col("vec_id"), col("embedding")),
      Similarity.knnGraph(emb, "vec_id", "embedding", centroids,
          degree = 3, nprobe = 2)
        .select(col("vec_id").as("src"), col("nbr_id").as("dst")),
      queries, seed, width = lit(4), steps = 3))
    assert(mFinal.nonEmpty && mFinal == bFinal,
      "walk over the maintained graph diverged from the batch build")
    GraftSession.release(spark)
  }

  test("a re-delivered vec_id refuses loudly instead of corrupting the fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_knngre").toString
    val lo = emb.filter(col("vec_id") < 100)
    lo.coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.knnGraphMaintained(
      stream, "vec_id", "embedding", centroids, s"$dir/state",
      "knng_redeliver_spec", degree = 3, nprobe = 2)
    try {
      q.processAllAvailable()
      // b1 re-delivers half of b0's ids (an upstream replay / embedding
      // update): the fold must throw, not silently duplicate members
      lo.filter(col("vec_id") < 50).coalesce(1)
        .write.parquet(s"$dir/in/b1")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("already folded") ||
        Option(e.getCause).exists(_.getMessage.contains("already folded")),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
    GraftSession.release(spark)
  }

  test("a null id refuses loudly (ADVICE r18: the re-delivery semi-join can never match null)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_knngnull").toString
    emb.filter(col("vec_id") < 50)
      .withColumn("vec_id",
        when(col("vec_id") === 7, lit(null)).otherwise(col("vec_id")))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(emb.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.knnGraphMaintained(
      stream, "vec_id", "embedding", centroids, s"$dir/state",
      "knng_null_spec", degree = 3, nprobe = 2)
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("null id") ||
        Option(e.getCause).exists(_.getMessage.contains("null id")),
        s"wrong failure: ${e.getMessage}")
    } finally q.stop()
    GraftSession.release(spark)
  }

  test("graphBeamSearch refuses a keys list without q_id (ADVICE r18)") {
    import spark.implicits._
    val nodes = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val edges = Seq((1L, 1L)).toDF("src", "dst")
    val queries = Seq((0L, Array(1.0f, 0.0f))).toDF("q_id", "qv")
    val f0 = Seq(("v", 1L, 1.0)).toDF("variant", "node", "ncos")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.graphBeamSearch(
        nodes, edges, queries, f0, keys = Seq("variant"))
    }
    assert(e.getMessage.contains("q_id"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{PipelineRunner, PipelineSpec, SinkSpec, SourceSpec, TransformSpec}
import graft.operators.Quality

/** Round 10 (VERDICT r9 task 5): the stateful YAML stages on the
  * STREAMING pipeline surface. `neardedup` maps to the minhash dedup
  * fold, `quality` to the running audit fold — both writing versioned
  * state to the pipeline's sink path — and stage kinds with no
  * streaming twin are refused with diagnosable errors BEFORE the query
  * starts. Batch boundaries are driven with explicit
  * write→processAllAvailable steps (the round-8 watermark-spec lesson:
  * files arriving in one trigger fold as one batch, so trigger-level
  * splitting is not reliable — explicit steps are).
  */
class StreamingYamlStagesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsSpec(name: String, inDir: String, outDir: String,
      stage: TransformSpec): PipelineSpec =
    PipelineSpec(name = name,
      source = SourceSpec("file",
        Map("path" -> s"$inDir/*", "format" -> "parquet")),
      transformations = Seq(stage),
      sink = SinkSpec("parquet", Map("path" -> outDir)),
      streaming = true)

  test("streaming quality stage == batch audit over the same files") {
    val in = tmp("graft_yq_in"); val out = tmp("graft_yq_out")
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang")).persist()
    val mid = docs.agg(((min(col("doc_id")) + max(col("doc_id"))) / 2)
      .cast("long")).head().getLong(0)
    docs.filter(col("doc_id") <= mid).coalesce(1).write.parquet(s"$in/b0")
    val rules = Seq(Map("kind" -> "not_null", "column" -> "text"),
      Map("kind" -> "in_set", "column" -> "lang",
        "allowed" -> "de,en,es,fr,zh"))
    val spec = docsSpec("yq_stream", in, out,
      TransformSpec("quality", Map("rules" -> rules)))
    val q = PipelineRunner.runStream(spark, spec)
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") > mid).coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingOps.latestState(spark, out).get
      .collect().head
    val expected = Quality.audit(docs,
      Seq(Quality.NotNull("text"),
        Quality.InSet("lang", Seq("de", "en", "es", "fr", "zh"))))
      .collect().head
    for (c <- Seq("n_rows", "null_text", "domain_lang"))
      assert(streamed.getAs[Long](c) == expected.getAs[Long](c),
        s"$c diverged: streamed $streamed vs batch $expected")
    GraftSession.release(spark)
  }

  test("streaming neardedup == batch pipeline survivors on a connected-dup corpus") {
    import spark.implicits._
    val in = tmp("graft_ynd_in"); val out = tmp("graft_ynd_out")
    // fully-connected duplicate clusters (every member pairwise
    // near-identical): the fold's neighbor-minima rule and the batch
    // stage's component-minima rule coincide by construction
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b0 = Seq(
      (1L, s"$base one"), (2L, s"$base two"), // dup cluster {1,2,5}
      (3L, "totally different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (5L, s"$base three"),
      (7L, "another standalone document with its own vocabulary set")
    ).toDF("doc_id", "text")
    b0.coalesce(1).write.parquet(s"$in/b0")
    val stage = TransformSpec("neardedup", Map(
      "id" -> "doc_id", "text" -> "text", "mode" -> "word",
      "ngram" -> "2", "threshold" -> "7/10", "orderBy" -> "doc_id ASC"))
    val q = PipelineRunner.runStream(spark,
      docsSpec("ynd_stream", in, out, stage))
    try {
      q.processAllAvailable()
      b1.coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val streamedKept = graft.streaming.StreamingOps.latestState(spark, out)
      .get.filter(!col("is_dup")).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val batchKept = graft.operators.Transforms(
        b0.unionByName(b1), Seq(stage))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(streamedKept == batchKept,
      s"streamed survivors $streamedKept != batch survivors $batchKept")
    assert(streamedKept.contains(1L) && !streamedKept.contains(2L) &&
      !streamedKept.contains(5L), s"dup cluster not collapsed: $streamedKept")
    GraftSession.release(spark)
  }

  test("neardedup reconcile rewrites fold state to batch component-minima on a transitive chain") {
    import spark.implicits._
    val in = tmp("graft_yrc_in"); val out = tmp("graft_yrc_out")
    // The divergence fixture: A~B, B~C, A≁C with the BRIDGE carrying
    // the largest id. A and C are word-disjoint; B shares 8 of its 16
    // words with each (exact Jaccard 8/18 = 0.444 vs A and vs C, 0
    // between A and C) at threshold 1/3 — comfortable margins on both
    // sides of tau for the 128-hash signature estimate too. The fold
    // keeps {1, 2} (doc 2's only neighbor, doc 3, has a LARGER id);
    // batch connected components keep only {1}.
    val aWords = (1 to 10).map(i => f"alpha$i%02d")
    val cWords = (1 to 10).map(i => f"omega$i%02d")
    val bWords = aWords.take(8) ++ cWords.take(8)
    val b0 = Seq((1L, aWords.mkString(" ")), (2L, cWords.mkString(" ")))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, bWords.mkString(" "))).toDF("doc_id", "text")
    b0.coalesce(1).write.parquet(s"$in/b0")
    val stage = TransformSpec("neardedup", Map(
      "id" -> "doc_id", "text" -> "text", "mode" -> "word",
      "ngram" -> "1", "threshold" -> "1/3", "orderBy" -> "doc_id ASC"))
    val q = PipelineRunner.runStream(spark,
      docsSpec("yrc_stream", in, out, stage))
    try {
      q.processAllAvailable()
      b1.coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    def kept() = graft.streaming.StreamingOps.latestState(spark, out)
      .get.filter(!col("is_dup")).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept() == Seq(1L, 2L),
      s"fold should keep {1, 2} (neighbor-minima) on the chain, got ${kept()}")
    // the reconcile pass — same threshold the stage derived banding from
    graft.streaming.StreamingOps.minhashDedupReconcile(
      spark, out, tauNum = 1, tauDen = 3)
    val batchKept = graft.operators.Transforms(b0.unionByName(b1), Seq(stage))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept() == batchKept,
      s"reconciled survivors ${kept()} != batch survivors $batchKept")
    assert(kept() == Seq(1L))
    // idempotent: a second pass changes nothing
    graft.streaming.StreamingOps.minhashDedupReconcile(
      spark, out, tauNum = 1, tauDen = 3)
    assert(kept() == Seq(1L))
    GraftSession.release(spark)
  }

  test("reconcile crash repair: a pending marker restores the pre-image and the fold refuses it") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val in = tmp("graft_yrr_in"); val out = tmp("graft_yrr_out")
    Seq((1L, "solo document unique words")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b0")
    val stage = TransformSpec("neardedup", Map(
      "id" -> "doc_id", "text" -> "text", "mode" -> "word",
      "ngram" -> "1", "threshold" -> "1/2", "orderBy" -> "doc_id ASC"))
    val q = PipelineRunner.runStream(spark,
      docsSpec("yrr_stream", in, out, stage))
    try q.processAllAvailable() finally q.stop()
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = graft.streaming.StreamingOps.stateVersions(spark, out).last
    // simulate a crash mid-swap: version parked at _pre, marker present
    assert(fs.rename(new Path(s"$out/v=$v"), new Path(s"$out/_pre_$v")))
    val mk = fs.create(new Path(s"$out/_reconcile_pending"), true)
    try mk.write(v.toString.getBytes("UTF-8")) finally mk.close()
    // the fold refuses to resume over the pending marker (a new file
    // must arrive for foreachBatch to fire at all)
    Seq((2L, "second solo document other vocabulary")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b1")
    val q2 = PipelineRunner.runStream(spark,
      docsSpec("yrr_stream", in, out, stage))
    val e = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("_reconcile_pending")), chain(e).toString)
    // re-running the reconcile repairs and completes
    graft.streaming.StreamingOps.minhashDedupReconcile(spark, out)
    assert(!fs.exists(new Path(s"$out/_reconcile_pending")))
    assert(!fs.exists(new Path(s"$out/_pre_$v")))
    val st = graft.streaming.StreamingOps.latestState(spark, out).get
    assert(st.filter(!col("is_dup")).count() == 1)
    GraftSession.release(spark)
  }

  test("stage kinds with no streaming twin are refused before start") {
    val in = tmp("graft_yr_in"); val out = tmp("graft_yr_out")
    import spark.implicits._
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(s"$in/b0")
    def run(stage: TransformSpec, extra: Seq[TransformSpec] = Nil) =
      PipelineRunner.runStream(spark, docsSpec("yr", in, out, stage)
        .copy(transformations = extra :+ stage))
    // dedup: no streaming twin
    val e1 = intercept[IllegalArgumentException] {
      run(TransformSpec("dedup",
        Map("keys" -> "doc_id", "orderBy" -> "doc_id")))
    }
    assert(e1.getMessage.contains("no streaming twin"))
    // neardedup with a non-id survivor order
    val e2 = intercept[IllegalArgumentException] {
      run(TransformSpec("neardedup", Map("id" -> "doc_id",
        "text" -> "text", "orderBy" -> "text DESC, doc_id ASC")))
    }
    assert(e2.getMessage.contains("smaller-id-wins"))
    // quality with a non-row-local rule
    val e3 = intercept[IllegalArgumentException] {
      run(TransformSpec("quality", Map("rules" ->
        Seq(Map("kind" -> "unique", "column" -> "doc_id")))))
    }
    assert(e3.getMessage.contains("row-local"))
    // streaming semdedup without a pinned centroid frame
    val e5 = intercept[IllegalArgumentException] {
      run(TransformSpec("semdedup", Map("id" -> "doc_id",
        "vector" -> "emb", "tau" -> "0.4")))
    }
    assert(e5.getMessage.contains("centroidsPath"))
    // streaming decontaminate in semantic mode WITHOUT a pinned
    // quantizer (round 19: the mode itself now streams — the
    // evidence fold — but the centroid frame must be fixed)
    val e6 = intercept[IllegalArgumentException] {
      run(TransformSpec("decontaminate", Map("mode" -> "semantic",
        "id" -> "doc_id", "vector" -> "emb", "tau" -> "0.4",
        "benchPath" -> s"$in/b0")))
    }
    assert(e6.getMessage.contains("centroidsPath"))
    // stateful stage not last
    val e4 = intercept[IllegalArgumentException] {
      PipelineRunner.runStream(spark, docsSpec("yr", in, out,
        TransformSpec("identity", Map.empty)).copy(transformations = Seq(
        TransformSpec("quality", Map("rules" ->
          Seq(Map("kind" -> "not_null", "column" -> "text")))),
        TransformSpec("identity", Map.empty))))
    }
    assert(e4.getMessage.contains("final transform"))
  }

  test("streaming semdedup == batch semdedup stage survivors") {
    val in = tmp("graft_ysd_in"); val out = tmp("graft_ysd_out")
    val cenDir = tmp("graft_ysd_cen") + "/cen"
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv"))
      .write.parquet(cenDir)
    val mid = emb.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    val stage = TransformSpec("semdedup", Map("id" -> "vec_id",
      "vector" -> "embedding", "tau" -> "0.4", "centroidsPath" -> cenDir))
    // batches arrive in id order (the fold's smaller-id contract)
    emb.filter(col("vec_id") <= mid).coalesce(1).write.parquet(s"$in/b0")
    val q = PipelineRunner.runStream(spark, PipelineSpec(
      name = "ysd", source = SourceSpec("file",
        Map("path" -> s"$in/*", "format" -> "parquet",
          "maxFilesPerTrigger" -> "1")),
      transformations = Seq(stage),
      sink = SinkSpec("parquet", Map("path" -> out)), streaming = true))
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") > mid).coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingOps.latestState(spark, out).get
      .filter(!col("is_dup")).collect().map(_.getAs[Long]("id")).sorted.toSeq
    val batch = graft.operators.Transforms.applyOne(emb, stage)
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed semdedup diverged (${streamed.size} vs ${batch.size})")
    GraftSession.release(spark)
  }

  test("streaming knnindex maintains the batch knnGraph (minNodeId applied — anchors never enter)") {
    val in = tmp("graft_yki_in"); val out = tmp("graft_yki_out")
    val cenDir = tmp("graft_yki_cen") + "/cen"
    val dataRoot = tmp("graft_yki_root")
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    emb.write.parquet(s"$dataRoot/embeddings.parquet")
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    val cen = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv"))
    cen.write.parquet(cenDir)
    val stage = TransformSpec("knnindex", Map(
      "id" -> "vec_id", "vector" -> "embedding", "degree" -> "3",
      "nprobe" -> "2", "minNodeId" -> "5", "sourcePath" -> dataRoot,
      "centroidsPath" -> cenDir))
    val mid = emb.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    // the full corpus INCLUDING anchors streams through — the stage
    // must exclude them from the maintained graph like the batch one
    emb.filter(col("vec_id") <= mid).coalesce(1).write.parquet(s"$in/b0")
    val q = PipelineRunner.runStream(spark, PipelineSpec(
      name = "yki", source = SourceSpec("file",
        Map("path" -> s"$in/*", "format" -> "parquet",
          "maxFilesPerTrigger" -> "1")),
      transformations = Seq(stage),
      sink = SinkSpec("parquet", Map("path" -> out)), streaming = true))
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") > mid).coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val state = graft.streaming.StreamingOps.latestState(spark, out).get
    assert(state.filter(col("kind") === "v")
      .filter(col("id") < 5).count() == 0,
      "anchors below minNodeId leaked into the maintained graph")
    val streamed = graft.streaming.StreamingOps.knnGraphCurrent(state)
      .select(col("id"), col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val batch = graft.operators.Similarity.knnGraph(
        emb.filter(col("vec_id") >= 5), "vec_id", "embedding", cen, 3, 2)
      .select(col("vec_id"), col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed knnindex graph diverged (${streamed.size} vs ${batch.size})")
    GraftSession.release(spark)
  }

  test("streaming semantic decontaminate evidence == batch screenSemantic (round 19)") {
    val in = tmp("graft_ysc_in"); val out = tmp("graft_ysc_out")
    val cenDir = tmp("graft_ysc_cen") + "/cen"
    val benchDir = tmp("graft_ysc_bench") + "/bench"
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv"))
      .write.parquet(cenDir)
    // planted leakage: every ~40th vector IS the benchmark
    emb.filter(col("vec_id") % 40 === 0)
      .select(col("embedding").as("bvec")).write.parquet(benchDir)
    val stage = TransformSpec("decontaminate", Map(
      "mode" -> "semantic", "id" -> "vec_id", "vector" -> "embedding",
      "tau" -> "0.95", "benchPath" -> benchDir,
      "benchVector" -> "bvec", "centroidsPath" -> cenDir))
    val mid = emb.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    emb.filter(col("vec_id") <= mid).coalesce(1).write.parquet(s"$in/b0")
    val q = PipelineRunner.runStream(spark, PipelineSpec(
      name = "ysc", source = SourceSpec("file",
        Map("path" -> s"$in/*", "format" -> "parquet",
          "maxFilesPerTrigger" -> "1")),
      transformations = Seq(stage),
      sink = SinkSpec("parquet", Map("path" -> out)), streaming = true))
    try {
      q.processAllAvailable()
      emb.filter(col("vec_id") > mid).coalesce(1).write.parquet(s"$in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingOps.latestState(spark, out).get
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_hits")))
      .sortBy(_._1).toSeq
    val bench = spark.read.parquet(benchDir)
      .select(col("bvec").as("embedding"))
      .withColumn("vec_id", monotonically_increasing_id())
    val cen = spark.read.parquet(cenDir)
    val batch = graft.operators.Contamination.screenSemantic(
        emb, bench, "vec_id", "embedding", cen, 0.95)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_hits")))
      .sortBy(_._1).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed semantic evidence diverged (${streamed.size} vs " +
        s"${batch.size})")
    // the batch stage's survivors are exactly the zero-evidence ids —
    // the two surfaces threshold one kernel
    val stageSurvivors = graft.operators.Transforms.applyOne(emb, stage)
      .collect().map(_.getAs[Long]("vec_id")).sorted.toSeq
    assert(stageSurvivors ==
      streamed.filter(_._2 == 0L).map(_._1).sorted.toSeq)
    GraftSession.release(spark)
  }

  test("reconcile refuses params that diverge from the state's _minhash_params") {
    import spark.implicits._
    val in = tmp("graft_ypm_in"); val out = tmp("graft_ypm_out")
    Seq((1L, "solo document unique words")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b0")
    val stage = TransformSpec("neardedup", Map(
      "id" -> "doc_id", "text" -> "text", "mode" -> "word",
      "ngram" -> "1", "threshold" -> "1/2", "orderBy" -> "doc_id ASC"))
    val q = PipelineRunner.runStream(spark,
      docsSpec("ypm_stream", in, out, stage))
    try q.processAllAvailable() finally q.stop()
    // the stage pinned tau=1/2 (bands=64); a reconcile at tau=7/8
    // derives bands=16 — a candidate SUBSET that could unmark decided
    // dups, so it must refuse before touching state
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingOps.minhashDedupReconcile(
        spark, out, tauNum = 7, tauDen = 8)
    }
    assert(e.getMessage.contains("_minhash_params"), e.getMessage)
    // matching params still run fine
    graft.streaming.StreamingOps.minhashDedupReconcile(spark, out)
    GraftSession.release(spark)
  }

  test("a no-op reconcile on an empty state dir does not pre-pin params") {
    import org.apache.hadoop.fs.Path
    val out = tmp("graft_ynp_out")
    // nothing to reconcile: must neither fail nor write _minhash_params
    // (pre-pinning its defaults here would falsely refuse the FIRST
    // real fold if that fold runs at a different tau)
    graft.streaming.StreamingOps.minhashDedupReconcile(spark, out)
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$out/_minhash_params")))
  }

  test("reconcile repair is total: an empty torn marker cannot brick the state dir") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val in = tmp("graft_ytm_in"); val out = tmp("graft_ytm_out")
    Seq((1L, "solo document unique words")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$in/b0")
    val stage = TransformSpec("neardedup", Map(
      "id" -> "doc_id", "text" -> "text", "mode" -> "word",
      "ngram" -> "1", "threshold" -> "1/2", "orderBy" -> "doc_id ASC"))
    val q = PipelineRunner.runStream(spark,
      docsSpec("ytm_stream", in, out, stage))
    try q.processAllAvailable() finally q.stop()
    val fs = new Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = graft.streaming.StreamingOps.stateVersions(spark, out).last
    // case 1: zero-length marker, live version intact (a legacy writer
    // crashed between create and write) — repair deletes the marker
    fs.create(new Path(s"$out/_reconcile_pending"), true).close()
    graft.streaming.StreamingOps.minhashDedupReconcile(spark, out)
    assert(!fs.exists(new Path(s"$out/_reconcile_pending")))
    assert(graft.streaming.StreamingOps
      .latestState(spark, out).get.count() == 1)
    // case 2: zero-length marker AND the version parked at _pre (crash
    // after the park) — repair derives v from the _pre_* dir name
    assert(fs.rename(new Path(s"$out/v=$v"), new Path(s"$out/_pre_$v")))
    fs.create(new Path(s"$out/_reconcile_pending"), true).close()
    graft.streaming.StreamingOps.minhashDedupReconcile(spark, out)
    assert(!fs.exists(new Path(s"$out/_reconcile_pending")))
    assert(!fs.exists(new Path(s"$out/_pre_$v")))
    assert(fs.exists(new Path(s"$out/v=$v")))
    assert(graft.streaming.StreamingOps
      .latestState(spark, out).get.count() == 1)
    GraftSession.release(spark)
  }
}

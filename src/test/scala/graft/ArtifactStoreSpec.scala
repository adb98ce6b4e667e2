package graft

import org.apache.spark.sql.functions._
import graft.operators.ArtifactStore
import graft.streaming.StreamingOps

/** Round 19 (VERDICT r18 task 1): the durable, params-pinned index
  * artifact. A cold NEW session must hit the pinned artifact (no
  * n^1.5 rebuild), params divergence must refuse loudly, a different
  * source must address a different artifact, and a
  * knnGraphMaintained state must export to the SAME address the batch
  * build pins — so the stream-maintained index IS the batch
  * consumers' index across sessions.
  */
class ArtifactStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_idx_root").toString

  private def withIndexRoot[T](root: String)(body: => T): T = {
    spark.conf.set("spark.graft.indexDir", root)
    try body
    finally {
      spark.conf.unset("spark.graft.indexDir")
      GraftSession.invalidateModels()
    }
  }

  test("a cold new session hits the pinned artifact — no rebuild") {
    val root = freshRoot()
    withIndexRoot(root) {
      var builds = 0
      def get() = GraftSession.pinnedArtifact(spark, "as-spec", sf,
        Seq("kind" -> "test", "p" -> "1")) { base =>
        builds += 1
        spark.range(3).write.parquet(s"$base/data")
      }
      val p1 = get()
      assert(builds == 1 && p1.contains("src="))
      assert(get() == p1 && builds == 1) // session memo
      // "cold new session": the in-memory memo is gone, only the
      // pinned parquet remains — must resolve WITHOUT rebuilding
      GraftSession.invalidateModels()
      val p2 = get()
      assert(p2 == p1, "a new session must resolve the same address")
      assert(builds == 1, "a new session must NOT rebuild")
      assert(spark.read.parquet(s"$p2/data").count() == 3)
    }
  }

  test("params divergence refuses loudly and names the drifted key") {
    val root = freshRoot()
    val fp = ArtifactStore.sourceFingerprint(spark, sf)
    ArtifactStore.pinned(spark, root, "knn-like", fp,
      ArtifactStore.knnGraphParams(6, 2, 5L, "id_below_23") :+ ("source" -> fp)) {
      base => spark.range(1).write.parquet(s"$base/edges")
    }
    val e = intercept[IllegalStateException] {
      ArtifactStore.pinned(spark, root, "knn-like", fp,
        ArtifactStore.knnGraphParams(7, 2, 5L, "id_below_23") :+ ("source" -> fp)) {
        base => fail("must refuse before building")
      }
    }
    assert(e.getMessage.contains("degree") &&
      e.getMessage.contains("stored=6") &&
      e.getMessage.contains("requested=7"), e.getMessage)
  }

  test("a different/mutated source fingerprints to a different address (no stale read)") {
    val root = freshRoot()
    // two "corpora": a copy of one table, then the copy mutated
    val srcA = java.nio.file.Files.createTempDirectory("graft_srcA").toString
    Tables.load(spark, sf, "region").write.parquet(s"$srcA/t.parquet")
    val fpA = ArtifactStore.sourceFingerprint(spark, srcA)
    var builds = 0
    def pin(fp: String) = ArtifactStore.pinned(spark, root, "x", fp,
      Seq("kind" -> "test", "source" -> fp)) { base =>
      builds += 1; spark.range(1).write.parquet(s"$base/d")
    }
    val pA = pin(fpA)
    // mutate: append a file — the fingerprint must change
    spark.range(9).write.mode("append").parquet(s"$srcA/t.parquet")
    val fpB = ArtifactStore.sourceFingerprint(spark, srcA)
    assert(fpB != fpA, "fingerprint must see the data change")
    val pB = pin(fpB)
    assert(pB != pA && builds == 2)
    // the original artifact is untouched and still valid
    assert(spark.read.parquet(s"$pA/d").count() == 1)
  }

  test("maintained-state export lands at the batch build's address; a cold batch session walks it unchanged") {
    val root = freshRoot()
    // the batch consumers' ground truth, built with NO index root
    // (session-temp artifact — the measured-bench shape)
    GraftSession.invalidateModels()
    val baseline = SparkEntry.queries("ann_graph_search")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    GraftSession.invalidateModels()

    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    val centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv"))
    val nodes = emb.filter(col("vec_id") >= 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_knnexp").toString
    nodes.coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(nodes.schema).parquet(s"$dir/in/*")
    val q = StreamingOps.knnGraphMaintained(stream, "vec_id", "embedding",
      centroids, s"$dir/state", "knng_export_spec", degree = 6, nprobe = 2)
    try q.processAllAvailable() finally q.stop()

    withIndexRoot(root) {
      // partial state refuses: export contract is full-corpus coverage
      val partDir = java.nio.file.Files
        .createTempDirectory("graft_knnpart").toString
      nodes.filter(col("vec_id") % 2 === 0).coalesce(1)
        .write.parquet(s"$partDir/in/b0")
      val ps = spark.readStream.schema(nodes.schema)
        .parquet(s"$partDir/in/*")
      val pq = StreamingOps.knnGraphMaintained(ps, "vec_id", "embedding",
        centroids, s"$partDir/state", "knng_part_spec",
        degree = 6, nprobe = 2)
      try pq.processAllAvailable() finally pq.stop()
      val pe = intercept[IllegalStateException] {
        StreamingOps.exportKnnGraphArtifact(spark, s"$partDir/state", sf,
          degree = 6, nprobe = 2, minNodeId = 5L, centroids = s"id_below_$k")
      }
      assert(pe.getMessage.contains("members"), pe.getMessage)

      // the real export commits at the pinned address
      val exported = StreamingOps.exportKnnGraphArtifact(spark,
        s"$dir/state", sf, degree = 6, nprobe = 2, minNodeId = 5L, centroids = s"id_below_$k")
      assert(spark.read.parquet(s"$exported/edges").count() > 0)
      // a cold batch session (fresh memo) resolving the same artifact
      // must HIT the export — probe with a build that throws
      GraftSession.invalidateModels()
      val probe = GraftSession.pinnedArtifact(spark, "knn_graph_d6", sf,
        ArtifactStore.knnGraphParams(6, 2, 5L, s"id_below_$k")) { _ =>
        fail("batch consumer must hit the exported artifact, not rebuild")
      }
      assert(probe == exported)
      // and the batch query over the exported index returns exactly
      // the session-temp build's result (same index, same walk)
      val viaExport = SparkEntry.queries("ann_graph_search")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(viaExport == baseline,
        "walk over the exported maintained graph must equal the batch build")
    }
    GraftSession.release(spark)
  }

  test("annIndexFreshness closes the build/maintain/serve triangle over an advancing stream") {
    val root = freshRoot()
    // a HALF-corpus dataset root: the artifact will cover exactly it
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    val mid = emb.agg(((min(col("vec_id")) + max(col("vec_id"))) / 2)
      .cast("long")).head().getLong(0)
    val dsHalf = java.nio.file.Files
      .createTempDirectory("graft_fresh_ds").toString
    emb.filter(col("vec_id") <= mid).write
      .parquet(s"$dsHalf/embeddings.parquet")
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    val centroids = emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"),
        col("embedding").as("cv"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fresh_st").toString
    val nodes = emb.filter(col("vec_id") >= 5)
    nodes.filter(col("vec_id") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(nodes.schema).parquet(s"$dir/in/*")
    val q = StreamingOps.knnGraphMaintained(stream, "vec_id", "embedding",
      centroids, s"$dir/state", "knng_fresh_spec", degree = 6, nprobe = 2)
    try {
      q.processAllAvailable()
      withIndexRoot(root) {
        val art = StreamingOps.exportKnnGraphArtifact(spark, s"$dir/state",
          dsHalf, degree = 6, nprobe = 2, minNodeId = 5L,
          centroids = s"id_below_$k")
        // state == artifact: fresh
        val fresh = StreamingOps.annIndexFreshness(spark,
          s"$dir/state", art).head()
        assert(fresh.getAs[Boolean]("is_fresh"),
          s"just-exported state must read fresh: $fresh")
        assert(fresh.getAs[Long]("n_unexported") == 0 &&
          fresh.getAs[Long]("n_orphaned") == 0)
        assert(fresh.getAs[String]("artifact_source_fp") ==
          ArtifactStore.sourceFingerprint(spark, dsHalf))
        val v0 = fresh.getAs[Long]("state_version")
        // the stream advances past the export: stale, and the report
        // says by how much
        nodes.filter(col("vec_id") > mid).coalesce(1)
          .write.parquet(s"$dir/in/b1")
        q.processAllAvailable()
        val stale = StreamingOps.annIndexFreshness(spark,
          s"$dir/state", art).head()
        assert(!stale.getAs[Boolean]("is_fresh"),
          s"advanced state must read stale: $stale")
        assert(stale.getAs[Long]("n_unexported") > 0)
        assert(stale.getAs[Long]("state_version") > v0)
        assert(stale.getAs[Long]("state_members") >
          stale.getAs[Long]("artifact_nodes"))
        // missing artifact refuses (operations fault, not "fresh")
        val e = intercept[IllegalStateException] {
          StreamingOps.annIndexFreshness(spark, s"$dir/state",
            s"$root/nothing/src=dead")
        }
        assert(e.getMessage.contains("no edges"), e.getMessage)
      }
    } finally q.stop()
    emb.unpersist()
    GraftSession.release(spark)
  }

  // ---- round 20: generation retention (VERDICT r19 task 3) ----

  private def buildGen(root: String, id: String, fp: String): String = {
    val p = ArtifactStore.pinned(spark, root, id, fp,
      Seq("kind" -> "test", "source" -> fp)) { base =>
      spark.range(4).write.parquet(s"$base/data")
    }
    Thread.sleep(20) // distinct dir mtimes — newest-first order is real
    p
  }

  private def dirExists(p: String): Boolean =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(p))

  test("generation retention: listing reports, superseded generations sweep after the NEW one commits, the current pin always survives") {
    val root = freshRoot()
    val a = buildGen(root, "ret-spec", "aaaa")
    // listing: one generation, real bytes
    val g1 = ArtifactStore.generations(spark, root, "ret-spec")
    assert(g1.map(_.fingerprint) == Seq("aaaa") && g1.head.bytes > 0)
    // a SECOND generation under indexRetain=1 sweeps the superseded
    // one — but only after its own commit (order pinned below)
    spark.conf.set("spark.graft.indexRetain", "1")
    try {
      val b = buildGen(root, "ret-spec", "bbbb")
      assert(dirExists(b) && !dirExists(a),
        "the superseded generation must sweep once the new one commits")
      // a FAILED build sweeps NOTHING: the old generation survives any
      // build that never validates
      intercept[RuntimeException] {
        ArtifactStore.pinned(spark, root, "ret-spec", "cccc",
          Seq("kind" -> "test", "source" -> "cccc")) { _ =>
          throw new RuntimeException("build crashed")
        }
      }
      assert(dirExists(b), "a failed build must not sweep the live generation")
      assert(ArtifactStore.generations(spark, root, "ret-spec")
        .map(_.fingerprint) == Seq("bbbb"))
    } finally spark.conf.unset("spark.graft.indexRetain")
    // explicit retain: keep-newest-N plus ALWAYS the current pin,
    // whatever its age
    val c = buildGen(root, "ret-spec", "dddd")
    val d = buildGen(root, "ret-spec", "eeee")
    val b2 = s"$root/ret-spec/src=bbbb"
    assert(ArtifactStore.generations(spark, root, "ret-spec").size == 3)
    val deleted = ArtifactStore.retain(spark, root, "ret-spec",
      keep = 1, current = Some(b2))
    assert(dirExists(d) && dirExists(b2) && !dirExists(c),
      "retain keeps the newest generation AND the pinned current one")
    assert(deleted == Seq(new org.apache.hadoop.fs.Path(c)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(c)).toString))
    // retention never touches another artifact id
    val other = buildGen(root, "ret-other", "aaaa")
    ArtifactStore.retain(spark, root, "ret-spec", keep = 1)
    assert(dirExists(other))
  }

  test("an artifact root nested in the fingerprinted source dir refuses on every surface") {
    val src = java.nio.file.Files.createTempDirectory("graft_nest").toString
    spark.range(2).write.parquet(s"$src/t.parquet")
    val e = intercept[IllegalArgumentException] {
      ArtifactStore.requireDisjointRoot(spark, s"$src/index", src)
    }
    assert(e.getMessage.contains("nested"), e.getMessage)
    // reader-hidden roots are exempt (the fingerprint skips them)
    ArtifactStore.requireDisjointRoot(spark, s"$src/_index", src)
    // and the inverse nesting (source under root) refuses too
    intercept[IllegalArgumentException] {
      ArtifactStore.requireDisjointRoot(spark, "/tmp", s"/tmp/x-$hashCode")
    }
    // disjoint trees pass
    ArtifactStore.requireDisjointRoot(spark, freshRoot(), src)
    // hidden entries do not perturb the address (ADVICE r19: a
    // committed artifact inside a `_`-dir must not re-fingerprint its
    // neighbors)
    val fp0 = ArtifactStore.sourceFingerprint(spark, src)
    new java.io.File(s"$src/_scratch").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/_scratch/junk.bin"), "junk")
    assert(ArtifactStore.sourceFingerprint(spark, src) == fp0,
      "hidden dirs/files must not change the source fingerprint")
  }
}

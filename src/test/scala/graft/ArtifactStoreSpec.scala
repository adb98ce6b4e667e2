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
}

package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{KnnServe, Transforms}
import graft.pipeline._

/** Round 20 (VERDICT r19 task 2): SERVING the pinned k-NN-graph
  * artifact. The read-only contract — an unbuilt artifact, a corpus
  * that mutated since the build, and drifted params all REFUSE with
  * the cause named (never a silent rebuild) — plus the REST face over
  * the same kernel.
  */
class KnnServeSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_serve_root").toString

  /** A private dataset root holding the sf embeddings table, plus the
    * committed knnindex artifact for it under a fresh index root.
    */
  private lazy val (dataRoot, builtRoot) = {
    val d = Files.createTempDirectory("graft_serve_ds").toString
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .write.parquet(s"$d/embeddings.parquet")
    val r = freshRoot()
    val df = spark.read.parquet(s"$d/embeddings.parquet")
    Transforms.applyOne(df, TransformSpec("knnindex", Map(
      "id" -> "vec_id", "vector" -> "embedding", "minNodeId" -> "5",
      "sourcePath" -> d, "indexRoot" -> r)))
    (d, r)
  }

  private def serveProps(extra: (String, Any)*): Map[String, Any] =
    (Map[String, Any]("sourcePath" -> dataRoot, "minNodeId" -> "5",
      "k" -> "3") ++ extra).toMap

  test("serving an unbuilt artifact refuses — never builds") {
    val e = intercept[IllegalStateException] {
      KnnServe.resolve(spark, freshRoot(),
        KnnServe.parseServe(serveProps()))
    }
    assert(e.getMessage.contains("no committed generation") &&
      e.getMessage.contains("knnindex"), e.getMessage)
  }

  test("a corpus mutated since the build refuses and names the existing generations") {
    // a second dataset root with one extra VISIBLE file: fingerprints
    // differ, so the committed generation no longer addresses it
    val d2 = Files.createTempDirectory("graft_serve_mut").toString
    val emb = spark.read.parquet(s"$dataRoot/embeddings.parquet")
    emb.write.parquet(s"$d2/embeddings.parquet")
    val r2 = freshRoot()
    Transforms.applyOne(emb, TransformSpec("knnindex", Map(
      "id" -> "vec_id", "vector" -> "embedding", "minNodeId" -> "5",
      "sourcePath" -> d2, "indexRoot" -> r2)))
    Files.writeString(java.nio.file.Paths.get(s"$d2/extra.csv"), "a,b\n1,2\n")
    val e = intercept[IllegalStateException] {
      KnnServe.resolve(spark, r2, KnnServe.parseServe(
        Map("sourcePath" -> d2, "minNodeId" -> "5")))
    }
    assert(e.getMessage.contains("NONE at this source's fingerprint") &&
      e.getMessage.contains("changed"), e.getMessage)
  }

  test("params drift at the pinned address refuses with the diff named") {
    val e = intercept[IllegalStateException] {
      KnnServe.resolve(spark, builtRoot, KnnServe.parseServe(
        serveProps("minNodeId" -> "0", "artifactId" -> "knn_graph_d6")))
    }
    assert(e.getMessage.contains("different params") &&
      e.getMessage.contains("minNodeId"), e.getMessage)
  }

  test("parse guards: k past the beam refuses (silent truncation trap)") {
    val e = intercept[IllegalArgumentException] {
      KnnServe.parseServe(serveProps("k" -> "9", "beam" -> "8"))
    }
    assert(e.getMessage.contains("beam >= k"), e.getMessage)
  }

  test("REST POST /api/index/search serves the artifact through the same kernel; refusals keep their HTTP codes") {
    val client = HttpClient.newHttpClient()
    def post(port: Int, path: String, body: String): (Int, String) = {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
    val mgr = new PipelineManager(spark)
    val srv = new RestServer(mgr).start()
    val port = srv.boundPort
    try {
      val qv = spark.read.parquet(s"$dataRoot/embeddings.parquet")
        .filter(col("vec_id") === 0).head.getSeq[Float](1)
      val body = qv.mkString("[", ", ", "]")
      val qs = s"sourcePath=${enc(dataRoot)}&indexRoot=${enc(builtRoot)}" +
        "&minNodeId=5&k=3"
      val (code, resp) = post(port, s"/api/index/search?$qs", body)
      assert(code == 200, s"$code: $resp")
      // same kernel, same answer: rank-1..3 ids equal the direct walk
      val direct = {
        val p = KnnServe.parseServe(serveProps())
        val r = KnnServe.resolve(spark, builtRoot, p)
        import spark.implicits._
        KnnServe.search(spark, r,
            Seq((0L, qv.toArray)).toDF("q_id", "qv"), 3, 8, 6)
          .orderBy(col("rank")).collect()
          .map(x => x.getAs[Number]("neighbor_id").longValue()).toSeq
      }
      val ids = """"id":(-?\d+)""".r.findAllMatchIn(resp)
        .map(_.group(1).toLong).toSeq
      assert(ids == direct, s"REST ids $ids != direct walk $direct ($resp)")
      // 409: read-only refusal (unbuilt root)
      val (c409, r409) = post(port,
        s"/api/index/search?sourcePath=${enc(dataRoot)}" +
          s"&indexRoot=${enc(freshRoot())}&minNodeId=5", body)
      assert(c409 == 409 && r409.contains("no committed generation"),
        s"$c409: $r409")
      // 400: no vector
      val (c400, _) = post(port, s"/api/index/search?$qs", "")
      assert(c400 == 400)
      // 400: missing sourcePath
      val (c400b, r400b) = post(port,
        s"/api/index/search?indexRoot=${enc(builtRoot)}", body)
      assert(c400b == 400 && r400b.contains("sourcePath"), s"$c400b: $r400b")
    } finally {
      srv.stop()
      GraftSession.release(spark)
    }
  }
}

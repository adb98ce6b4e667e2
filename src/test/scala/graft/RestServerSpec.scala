package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.pipeline._

/** Drives the reference's REST routes end to end over real HTTP:
  * an ephemeral-port RestServer wrapping a live PipelineManager, hit
  * with the JDK HttpClient. Mirrors controller/PipelineController.java.
  */
class RestServerSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-rest").toString

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("REST surface mirrors the reference controller") {
    val mgr = new PipelineManager(spark)
    val srv = new RestServer(mgr).start()
    val port = srv.boundPort
    try {
      // empty manager: status/count/jobs
      assert(get(port, "/api/pipelines/status") ==
        ((200, """{"runningCount":0,"hasRunningPipelines":false}""")))
      assert(get(port, "/api/pipelines/count") == ((200, "0")))
      assert(get(port, "/api/pipelines/jobs") == ((200, "{}")))

      // POST /start with a real batch config file (csv -> filter -> parquet)
      val in = tmp(); val out = tmp(); val cfgDir = tmp()
      Files.writeString(java.nio.file.Paths.get(s"$in/r.csv"),
        "id,status\n1,important\n2,normal\n")
      val cfg = s"""pipelines:
                   |  - name: "rest-batch"
                   |    source:
                   |      type: file
                   |      properties: { path: "$in", format: csv, header: "true" }
                   |    transformations:
                   |      - type: filter
                   |        properties: { column: "status", condition: "important" }
                   |    sink:
                   |      type: file
                   |      properties: { path: "$out/p", format: parquet }
                   |""".stripMargin
      val cfgPath = s"$cfgDir/cfg.yaml"
      Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)
      assert(post(port, s"/api/pipelines/start?configFilePath=$cfgPath")._1 == 200)
      assert(spark.read.parquet(s"$out/p").count() == 1)
      // batch job completed -> reported by manager, not "running"
      assert(mgr.status("rest-batch").contains("COMPLETED"))
      assert(get(port, "/api/pipelines/jobs/rest-batch/status") == ((200, "false")))

      // missing configFilePath -> 400 (reference throws IllegalArgument)
      assert(post(port, "/api/pipelines/start")._1 == 400)
      assert(post(port, "/api/pipelines/start?configFilePath=%20")._1 == 400)

      // a live streaming job: jobs payload carries name/status/submissionTime
      val sin = tmp()
      Files.writeString(java.nio.file.Paths.get(s"$sin/x.txt"), "a\nb\n")
      mgr.submit(PipelineSpec(
        name = "rest-stream",
        source = SourceSpec("directory", Map("path" -> sin, "format" -> "text")),
        transformations = Seq.empty,
        sink = SinkSpec("memory", Map.empty),
        streaming = true))
      assert(get(port, "/api/pipelines/count") == ((200, "1")))
      assert(get(port, "/api/pipelines/status") ==
        ((200, """{"runningCount":1,"hasRunningPipelines":true}""")))
      assert(get(port, "/api/pipelines/jobs/rest-stream/status") == ((200, "true")))
      val (jc, jbody) = get(port, "/api/pipelines/jobs")
      assert(jc == 200)
      assert(jbody.contains(""""rest-stream":{"name":"rest-stream","status":"RUNNING","submissionTime":"""))

      // streaming progress: poll until the first micro-batch completes,
      // then the route reports batchId + row counts (rates may render
      // null before steady state, but the fields must be present);
      // batch/unknown jobs 404
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var prog = get(port, "/api/pipelines/jobs/rest-stream/progress")
      while (prog._1 != 200 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        prog = get(port, "/api/pipelines/jobs/rest-stream/progress")
      }
      assert(prog._1 == 200, s"no progress before deadline: $prog")
      assert(prog._2.contains("\"batchId\":") &&
        prog._2.contains("\"numInputRows\":") &&
        prog._2.contains("\"inputRowsPerSecond\":") &&
        prog._2.contains("\"processedRowsPerSecond\":"), prog._2)
      // the counters object is always present ({} for a non-fold
      // stream); a fold job's refusal/lateness pressure renders here —
      // inject counters under this job's name to pin the rendering
      assert(prog._2.contains("\"counters\":{"), prog._2)
      graft.streaming.StreamingOps.bumpFoldCounter(
        "rest-stream", "late_buckets", 3L)
      graft.streaming.StreamingOps.bumpFoldCounter(
        "rest-stream", "refusals", 1L)
      val prog2 = get(port, "/api/pipelines/jobs/rest-stream/progress")._2
      assert(prog2.contains(
        "\"counters\":{\"late_buckets\":3,\"refusals\":1}"), prog2)
      // the jobs listing now embeds the same progress object
      val jb2 = get(port, "/api/pipelines/jobs")._2
      assert(jb2.contains("\"lastProgress\":{\"batchId\":"), jb2)
      assert(get(port, "/api/pipelines/jobs/rest-batch/progress")._1 == 404)
      assert(get(port, "/api/pipelines/jobs/ghost/progress")._1 == 404)

      // stop/{name}: 200 for the running job, 404 for unknown
      assert(post(port, "/api/pipelines/stop/rest-stream")._1 == 200)
      assert(get(port, "/api/pipelines/jobs/rest-stream/status") == ((200, "false")))
      assert(post(port, "/api/pipelines/stop/rest-stream")._1 == 404)
      assert(post(port, "/api/pipelines/stop/ghost")._1 == 404)

      // stop-all is idempotent and unknown routes 404
      assert(post(port, "/api/pipelines/stop-all")._1 == 200)
      assert(get(port, "/api/pipelines/nope")._1 == 404)
    } finally srv.stop()
  }

  test("start surfaces pipeline failures as 500 with per-pipeline statuses") {
    val mgr = new PipelineManager(spark)
    val srv = new RestServer(mgr).start()
    val port = srv.boundPort
    try {
      val cfgDir = tmp()
      val cfg = s"""pipelines:
                   |  - name: "bad-batch"
                   |    source:
                   |      type: file
                   |      properties: { path: "$cfgDir/does-not-exist", format: csv }
                   |    sink:
                   |      type: file
                   |      properties: { path: "$cfgDir/out", format: parquet }
                   |""".stripMargin
      val cfgPath = s"$cfgDir/cfg.yaml"
      Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)
      val (code, body) = post(port, s"/api/pipelines/start?configFilePath=$cfgPath")
      assert(code == 500, s"got $code: $body")
      assert(body.contains("\"bad-batch\"") && body.contains("FAILED"), body)
    } finally srv.stop()
  }

  test("encoded path parameters resolve to the decoded pipeline name") {
    val mgr = new PipelineManager(spark)
    val srv = new RestServer(mgr).start()
    val port = srv.boundPort
    try {
      val sin = tmp()
      Files.writeString(java.nio.file.Paths.get(s"$sin/x.txt"), "a\n")
      mgr.submit(PipelineSpec(
        name = "my stream",
        source = SourceSpec("directory", Map("path" -> sin, "format" -> "text")),
        transformations = Seq.empty,
        sink = SinkSpec("memory", Map.empty),
        streaming = true))
      assert(get(port, "/api/pipelines/jobs/my%20stream/status") == ((200, "true")))
      assert(post(port, "/api/pipelines/stop/my%20stream")._1 == 200)
      assert(get(port, "/api/pipelines/jobs/my%20stream/status") == ((200, "false")))
    } finally srv.stop()
  }

  test("GET /api/openapi.json describes exactly the served route table") {
    val mgr = new PipelineManager(spark)
    val srv = new RestServer(mgr).start()
    val port = srv.boundPort
    try {
      val (code, body) = get(port, "/api/openapi.json")
      assert(code == 200)
      assert(body.startsWith("""{"openapi":"3.0.3""""))
      // every documented route appears as a path entry carrying its
      // method and declared parameters — each check bounded to THAT
      // path's object (scanning to end-of-document would let a later
      // sibling satisfy a misplaced method/parameter)
      val starts = RestServer.routeTable.map(_.path).distinct
        .map(p => p -> body.indexOf("\"" + p + "\":")).toMap
      for (d <- RestServer.routeTable) {
        val from = starts(d.path)
        assert(from >= 0, s"openapi document is missing path ${d.path}")
        val to = starts.values.filter(_ > from)
          .minOption.getOrElse(body.length)
        val pathObj = body.substring(from, to)
        assert(pathObj.contains("\"" + d.method + "\":"),
          s"${d.path} is missing method ${d.method}")
        for ((n, in) <- d.params)
          assert(pathObj.contains(s""""name":"$n","in":"$in""""),
            s"${d.path} is missing parameter $n in $in")
      }
      // and nothing undocumented: each served route family resolves to
      // a documented path (spot-check the two the reference controller
      // clients depend on)
      assert(RestServer.routeTable.exists(d =>
        d.method == "post" && d.path == "/api/pipelines/start" &&
          d.params.contains("configFilePath" -> "query")))
      assert(RestServer.routeTable.count(_.method == "post") == 4)
    } finally srv.stop()
  }
}

package graft.pipeline

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The reference's REST management shell
  * (controller/PipelineController.java, base path /api/pipelines),
  * re-expressed over [[PipelineManager]] with the JDK's built-in
  * HttpServer — no web framework, no extra dependency.
  *
  * Routes (verbatim from the reference controller):
  *   GET  /api/pipelines/status              -> {"runningCount":N,"hasRunningPipelines":B}
  *   GET  /api/pipelines/jobs                -> {name:{"name":..,"status":..,"submissionTime":..}}
  *   GET  /api/pipelines/jobs/{name}/status  -> true|false
  *   GET  /api/pipelines/jobs/{name}/progress -> last micro-batch
  *     progress for a live streaming job (beyond the reference: batch
  *     id, row counts, rows/sec; 404 for batch/unknown/no-batch-yet)
  *   GET  /api/pipelines/count               -> N
  *   POST /api/pipelines/start?configFilePath=PATH
  *   POST /api/pipelines/stop/{name}         -> 200, 404 if not running
  *   POST /api/pipelines/stop-all
  *
  * The server is a thin stateless adapter: every route delegates to
  * the manager, so behavior (and tests) concentrate there. Driver-side
  * only — on a cluster this runs on the Spark driver next to the
  * SparkSession, exactly as the reference's controller runs inside the
  * Hazelcast member JVM.
  */
class RestServer(manager: PipelineManager, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // without an executor the JDK server dispatches every request on ONE
  // thread — a long synchronous batch submit via POST /start would
  // freeze /status, /jobs and even /stop until it finished. A cached
  // pool keeps the management surface responsive while a submit runs.
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
    r => { val t = new Thread(r, "graft-rest"); t.setDaemon(true); t }))

  /** Bound port (useful when constructed with port 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    ex.close()
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&").toSeq)
      .map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == key =>
        java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }

  server.createContext("/api/pipelines", (ex: HttpExchange) => {
    // DECODED path (getPath): static segments stay tolerant of legal
    // percent-encodings (RFC 3986 equivalence, Spring-compatible);
    // captured names are NOT decoded again — getPath already did it
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    val method = ex.getRequestMethod
    try {
      (method, path) match {
        case ("GET", "/api/pipelines/status") =>
          val n = manager.runningCount
          respond(ex, 200,
            s"""{"runningCount":$n,"hasRunningPipelines":${n > 0}}""")
        case ("GET", "/api/pipelines/jobs") =>
          val body = manager.runningJobs.toSeq.sortBy(_._1).map {
            case (name, ji) =>
              // streaming jobs additionally carry their last micro-batch
              // progress (beyond the reference's JobInfo — the numbers
              // an operator of a LIVE stream needs from a status poll)
              val prog = manager.lastProgress(name)
                .map(p => s""","lastProgress":${progressJson(name, p)}""")
                .getOrElse("")
              s"${jstr(name)}:{" +
                s""""name":${jstr(ji.name)},"status":${jstr(ji.status)},""" +
                s""""submissionTime":${ji.submissionTime}$prog}"""
          }.mkString("{", ",", "}")
          respond(ex, 200, body)
        case ("GET", JobProgressPath(name)) =>
          manager.lastProgress(decodePath(name)) match {
            case Some(p) => respond(ex, 200, progressJson(decodePath(name), p))
            case None => respond(ex, 404,
              s"""{"error":${jstr(s"no streaming progress for: ${decodePath(name)}")}}""")
          }
        case ("GET", "/api/pipelines/count") =>
          respond(ex, 200, manager.runningCount.toString)
        case ("GET", JobStatusPath(name)) =>
          respond(ex, 200, manager.isRunning(decodePath(name)).toString)
        case ("POST", "/api/pipelines/start") =>
          queryParam(ex, "configFilePath").map(_.trim).filter(_.nonEmpty) match {
            case None =>
              respond(ex, 400,
                """{"error":"Configuration file path cannot be empty"}""")
            case Some(cfgPath) =>
              // surface per-pipeline outcomes: the reference's
              // startAllPipelines rethrows execution failures (HTTP 500);
              // without this, a submit whose every pipeline Failed is
              // indistinguishable from success (jobs only lists RUNNING)
              val statuses = manager.submitAll(ConfigParser.parseFile(cfgPath))
              def label(st: manager.Status): String = st match {
                case manager.Completed => "COMPLETED"
                case _: manager.Running => "RUNNING"
                case manager.Failed(e) => s"FAILED: ${e.getMessage}"
              }
              val anyFailed = statuses.values.exists {
                case manager.Failed(_) => true; case _ => false
              }
              val body = statuses.toSeq.sortBy(_._1)
                .map { case (n, st) => s"${jstr(n)}:${jstr(label(st))}" }
                .mkString("{", ",", "}")
              respond(ex, if (anyFailed) 500 else 200, body)
          }
        case ("POST", "/api/pipelines/stop-all") =>
          manager.stopAll()
          respond(ex, 200, "")
        case ("POST", StopPath(rawName)) =>
          val name = decodePath(rawName)
          if (manager.stop(name)) respond(ex, 200, "")
          else respond(ex, 404,
            s"""{"error":${jstr(s"Pipeline not found or not running: $name")}}""")
        case _ =>
          respond(ex, 404, """{"error":"no such route"}""")
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    }
  })

  // INDEX-SERVE route (round 20 — VERDICT r19 task 2: the pinned
  // k-NN-graph artifact gets a query surface beside the job-management
  // routes, completing build → serve). POST the query vector as the
  // request body — a JSON array ("[0.1, -0.2, ...]"; bare
  // comma-separated floats also accepted) — with the knnsearch stage's
  // property vocabulary as query params (sourcePath required). Errors
  // keep their stage semantics: 400 = bad request (missing/invalid
  // params or vector), 409 = serve refusal (artifact unbuilt, corpus
  // mutated since the build, params drift — the read-only contract),
  // 500 = everything else.
  server.createContext("/api/index", (ex: HttpExchange) => {
    val path = ex.getRequestURI.getPath.stripSuffix("/")
    try {
      (ex.getRequestMethod, path) match {
        case ("POST", "/api/index/search") =>
          val props: Map[String, Any] =
            Seq("sourcePath", "sourceTable", "artifactId", "indexRoot",
              "centroidsPath", "degree", "nprobe", "minNodeId", "k",
              "beam", "steps")
              .flatMap(k => queryParam(ex, k).map(v => k -> (v: Any))).toMap
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val vec = body.replace('[', ' ').replace(']', ' ')
            .split("[,\\s]+").filter(_.nonEmpty).map(_.toFloat)
          if (vec.isEmpty)
            respond(ex, 400, """{"error":"request body must hold the query vector (JSON array or comma-separated floats)"}""")
          else {
            val hits = manager.knnSearch(props, vec)
            // NaN cosines (an all-zero query vector) render as JSON
            // null, never a bare NaN token — the jobs/progress rule
            val rows = hits.zipWithIndex.map { case ((id, cos), i) =>
              s"""{"rank":${i + 1},"id":$id,"cos":${jnum(cos)}}"""
            }.mkString("[", ",", "]")
            respond(ex, 200, s"""{"results":$rows}""")
          }
        case _ =>
          respond(ex, 404, """{"error":"no such route"}""")
      }
    } catch {
      case e: NumberFormatException => // subclass — must precede IAE
        respond(ex, 400, s"""{"error":${jstr("invalid query vector: " + e.getMessage)}}""")
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
      case e: IllegalStateException =>
        respond(ex, 409, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
      case e: Throwable =>
        respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    }
  })

  // machine-readable API description (round 9 — the reference ships
  // OpenAPI via config/OpenApiConfig.java; here it is hand-rolled JSON
  // generated from RestServer.routeTable, zero extra deps, and
  // RestServerSpec asserts the document covers the route table exactly)
  server.createContext("/api/openapi.json", (ex: HttpExchange) => {
    if (ex.getRequestMethod == "GET" &&
        ex.getRequestURI.getPath.stripSuffix("/") == "/api/openapi.json")
      respond(ex, 200, RestServer.openApiJson)
    else respond(ex, 404, """{"error":"no such route"}""")
  })

  private val JobStatusPath = "/api/pipelines/jobs/([^/]+)/status".r
  private val JobProgressPath = "/api/pipelines/jobs/([^/]+)/progress".r
  private val StopPath = "/api/pipelines/stop/([^/]+)".r

  /** Rates are NaN until the first complete micro-batch — render as
    * JSON null (a bare NaN token is invalid JSON and breaks parsers).
    */
  private def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** Progress JSON = Spark's own batch metrics + the job's fold
    * counters (refusal/lateness pressure recorded driver-side by the
    * stateful folds — see StreamingOps.foldCounters; `{}` for jobs
    * that are not versioned-state folds). Keys render sorted so the
    * document is deterministic.
    */
  private def progressJson(name: String, p: manager.ProgressInfo): String = {
    val ctr = manager.foldCounters(name).toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:$v" }.mkString(",")
    s"""{"batchId":${p.batchId},"numInputRows":${p.numInputRows},""" +
      s""""inputRowsPerSecond":${jnum(p.inputRowsPerSecond)},""" +
      s""""processedRowsPerSecond":${jnum(p.processedRowsPerSecond)},""" +
      s""""counters":{$ctr}}"""
  }

  /** Captured name segments come from getPath, which ALREADY
    * percent-decoded them once (matching Spring's @PathVariable) —
    * decoding again would corrupt names containing '%' or '+'.
    */
  private def decodePath(seg: String): String = seg

  def start(): RestServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

object RestServer {

  /** One documented route: method, OpenAPI path template, summary, and
    * (name, in) parameters ("path" or "query"). The single source the
    * OpenAPI document renders from and the spec audits against.
    */
  final case class RouteDoc(method: String, path: String, summary: String,
      params: Seq[(String, String)] = Nil)

  /** The server's full route surface (the reference controller's seven
    * routes + the progress and openapi extensions).
    */
  val routeTable: Seq[RouteDoc] = Seq(
    RouteDoc("get", "/api/pipelines/status",
      "Running-pipeline count and a boolean flag"),
    RouteDoc("get", "/api/pipelines/jobs",
      "All running jobs with status, submission time and, for streaming jobs, last micro-batch progress"),
    RouteDoc("get", "/api/pipelines/jobs/{name}/status",
      "Whether the named pipeline is running", Seq("name" -> "path")),
    RouteDoc("get", "/api/pipelines/jobs/{name}/progress",
      "Last micro-batch progress of a live streaming job plus its fold's refusal/lateness counters (404 for batch/unknown jobs)",
      Seq("name" -> "path")),
    RouteDoc("get", "/api/pipelines/count",
      "Number of running pipelines"),
    RouteDoc("post", "/api/pipelines/start",
      "Submit every pipeline in the YAML config; 500 with per-pipeline outcomes if any failed",
      Seq("configFilePath" -> "query")),
    RouteDoc("post", "/api/pipelines/stop/{name}",
      "Stop the named pipeline (404 if not running)", Seq("name" -> "path")),
    RouteDoc("post", "/api/pipelines/stop-all",
      "Stop every running pipeline"),
    RouteDoc("post", "/api/index/search",
      "Top-k graph-ANN search of the pinned knnindex artifact for the query vector in the request body (JSON array); read-only — 409 when the artifact is unbuilt, the corpus mutated, or params drifted",
      Seq("sourcePath" -> "query")),
    RouteDoc("get", "/api/openapi.json",
      "This document"))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** OpenAPI 3.0 document rendered from [[routeTable]]. */
  lazy val openApiJson: String = {
    val paths = routeTable.groupBy(_.path).toSeq.sortBy(_._1).map {
      case (path, docs) =>
        val ops = docs.sortBy(_.method).map { d =>
          val params =
            if (d.params.isEmpty) ""
            else d.params.map { case (n, in) =>
              s"""{"name":${jstr(n)},"in":${jstr(in)},"required":true,""" +
                s""""schema":{"type":"string"}}"""
            }.mkString(""""parameters":[""", ",", "],")
          s"${jstr(d.method)}:{$params" +
            s""""summary":${jstr(d.summary)},""" +
            s""""responses":{"200":{"description":"OK"}}}"""
        }.mkString(",")
        s"${jstr(path)}:{$ops}"
    }.mkString("{", ",", "}")
    s"""{"openapi":"3.0.3","info":{"title":"graft pipeline API",""" +
      s""""version":"1.0.0"},"paths":$paths}"""
  }
}

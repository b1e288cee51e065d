package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.TestSpark

/** Real HTTP round-trips over the admin surface (api/admin.py:243-400
  * parity): jobs/files listings with sort + page + filters, and the
  * unblock → reprocess integration.
  */
class AdminServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(texts: Map[Long, String]) = {
    import spark.implicits._
    texts.toSeq.map { case (id, t) => (id, t, s"src${id % 3}", "en") }
      .toDF("doc_id", "text", "source", "lang")
  }

  private val base = Map(
    1L -> ("alpha beta gamma " * 20).trim,
    2L -> ("delta epsilon zeta " * 15).trim,
    3L -> ("eta theta iota " * 10).trim)

  /** Three runs' worth of state + run logs, parent 2 manually blocked. */
  private def fixture(): (String, String, String) = {
    val root = Files.createTempDirectory("graft-admin")
    val (indexDir, stateDir, logDir) =
      (root.resolve("index").toString, root.resolve("state").toString,
        root.resolve("logs").toString)
    val r1 = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run-a")
    IncrementalIndexer.writeRunLog(r1, logDir)
    val r2 = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, "run-b")
    IncrementalIndexer.writeRunLog(r2, logDir)
    val touched = base + (1L -> ("fresh words here " * 9).trim)
    val r3 = IncrementalIndexer.runOnce(spark, docs(touched), indexDir, stateDir, "run-c")
    IncrementalIndexer.writeRunLog(r3, logDir)
    IncrementalIndexer.setBlocked(spark, stateDir, 2L, blocked = true)
    (indexDir, stateDir, logDir)
  }

  private def withServer(test: (Int, HttpClient, String, String) => Unit): Unit = {
    val (_, stateDir, logDir) = fixture()
    val server = AdminServer.start(0, spark, stateDir, logDir)
    try test(server.getAddress.getPort, HttpClient.newHttpClient(), stateDir, logDir)
    finally server.stop(0)
  }

  private def get(client: HttpClient, port: Int, pathQuery: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port$pathQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(client: HttpClient, port: Int, pathQuery: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$port$pathQuery"))
      .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())

  test("/api/jobs: envelope, sort order, and page slicing") {
    withServer { (port, client, _, _) =>
      val all = get(client, port, "/api/jobs?sortField=runId&sortOrder=asc&pageSize=2")
      assert(all.statusCode() == 200)
      assert(all.body().contains("\"total\":3"))
      // asc page 1 of size 2 = run-a, run-b; page 2 = run-c
      val p1 = all.body()
      assert(p1.indexOf("run-a") >= 0 && p1.indexOf("run-b") > p1.indexOf("run-a"))
      assert(!p1.contains("run-c"))
      val p2 = get(client, port,
        "/api/jobs?sortField=runId&sortOrder=asc&pageSize=2&page=2").body()
      assert(p2.contains("run-c") && !p2.contains("run-b"))
      // desc flips the order
      val desc = get(client, port, "/api/jobs?sortField=runId&sortOrder=desc").body()
      assert(desc.indexOf("run-c") < desc.indexOf("run-a"))
      // numeric sort field sorts numerically
      val byProcessed = get(client, port,
        "/api/jobs?sortField=processed&sortOrder=desc&pageSize=1").body()
      assert(byProcessed.contains("\"runId\":\"run-a\""), byProcessed)
    }
  }

  test("/api/jobs: search filters; invalid params are 400; wrong method 405") {
    withServer { (port, client, _, _) =>
      val hit = get(client, port, "/api/jobs?search=run-b").body()
      assert(hit.contains("\"total\":1") && hit.contains("run-b"))
      assert(get(client, port, "/api/jobs?page=0").statusCode() == 400)
      assert(get(client, port, "/api/jobs?pageSize=101").statusCode() == 400)
      assert(get(client, port, "/api/jobs?sortField=nope").statusCode() == 400)
      assert(get(client, port, "/api/jobs?sortOrder=sideways").statusCode() == 400)
      // overflowing numbers are invalid input (400), never a 500
      assert(get(client, port, "/api/jobs?page=99999999999").statusCode() == 400)
      assert(get(client, port, "/api/jobs?pageSize=99999999999").statusCode() == 400)
      // passes the per-field digit guards but page*pageSize overflows Int —
      // must be a clean 400, not a negative-offset 500
      assert(get(client, port,
        "/api/jobs?page=999999999&pageSize=100").statusCode() == 400)
      // malformed percent-encoding is client input → 400, not a 500
      // (java.net.http refuses to even send %zz, so speak raw HTTP)
      val sock = new java.net.Socket("localhost", port)
      try {
        val out = sock.getOutputStream
        out.write(("GET /api/jobs?search=%zz HTTP/1.1\r\n" +
          s"Host: localhost:$port\r\nConnection: close\r\n\r\n").getBytes("US-ASCII"))
        out.flush()
        val status = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream)).readLine()
        assert(status != null && status.contains("400"), s"got: $status")
      } finally sock.close()
      assert(post(client, port, "/api/jobs").statusCode() == 405)
      // prefix matches of the context path are not the resource
      assert(get(client, port, "/api/jobsgarbage").statusCode() == 404)
      assert(get(client, port, "/api/files/other").statusCode() == 404)
    }
  }

  test("/api/files: listing and blocked filter") {
    withServer { (port, client, _, _) =>
      val all = get(client, port, "/api/files?sortField=parent_id&sortOrder=asc")
      assert(all.statusCode() == 200)
      assert(all.body().contains("\"total\":3"))
      val blocked = get(client, port, "/api/files?blocked=true").body()
      assert(blocked.contains("\"total\":1") && blocked.contains("\"parent_id\":2"))
      val open = get(client, port, "/api/files?blocked=false").body()
      assert(open.contains("\"total\":2"))
      assert(get(client, port, "/api/files?blocked=maybe").statusCode() == 400)
    }
  }

  test("health, version, and the HTTP-triggered run endpoint") {
    val root = Files.createTempDirectory("graft-admin-run")
    val (indexDir, stateDir, logDir) =
      (root.resolve("index").toString, root.resolve("state").toString,
        root.resolve("logs").toString)
    val runner = (id: String) => {
      val s = IncrementalIndexer.runOnce(spark, docs(base), indexDir, stateDir, id)
      IncrementalIndexer.writeRunLog(s, logDir)
      s
    }
    val server = AdminServer.start(0, spark, stateDir, logDir,
      version = "0.6.0", runJob = Some(runner))
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      assert(get(client, port, "/healthz").body().contains("ok"))
      assert(get(client, port, "/readyz").statusCode() == 200)
      val ver = get(client, port, "/api/version")
      assert(ver.statusCode() == 200 && ver.body().contains("\"0.6.0\""))
      // trigger a run over HTTP; its summary comes back and the run log
      // appears in the jobs listing
      assert(post(client, port, "/api/jobs/run").statusCode() == 400)
      assert(get(client, port, "/api/jobs/run?runId=r-http").statusCode() == 405)
      val run = post(client, port, "/api/jobs/run?runId=r-http")
      assert(run.statusCode() == 200, run.body())
      assert(run.body().contains("\"runId\":\"r-http\""))
      assert(run.body().contains("\"processed\":3"))
      val listed = get(client, port, "/api/jobs").body()
      assert(listed.contains("r-http"))
    } finally server.stop(0)
  }

  test("leading-zero page params are normalized to valid JSON numbers") {
    withServer { (port, client, _, _) =>
      // "01"/"020" pass the digit validation; the echo must not reproduce
      // them verbatim — {"page":01} is invalid JSON (RFC 8259)
      val r = get(client, port, "/api/jobs?page=01&pageSize=020")
      assert(r.statusCode() == 200)
      assert(r.body().contains("\"page\":1,\"pageSize\":20"), r.body())
      assert(!r.body().contains(":01") && !r.body().contains(":020"))
    }
  }

  test("search cannot match a substring spanning two adjacent columns") {
    withServer { (port, client, _, _) =>
      // /api/files columns include parent_id=1 rows; a query built from the
      // END of one stringified column + the START of the next must miss
      val within = get(client, port, "/api/files?search=1").body()
      assert(!within.contains("\"total\":0")) // sanity: in-column match works
      // no single column contains "1true" / "1false", but parent_id=1
      // directly followed by a boolean column would match if unseparated
      Seq("1true", "1false").foreach { q =>
        val r = get(client, port, s"/api/files?search=$q").body()
        assert(r.contains("\"total\":0"), s"cross-column '$q' leaked: $r")
      }
    }
  }

  test("/healthz stays live while a long job run occupies a handler") {
    val root = Files.createTempDirectory("graft-admin-slow")
    val (stateDir, logDir) =
      (root.resolve("state").toString, root.resolve("logs").toString)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val slowRunner = (id: String) => {
      entered.countDown()
      release.await(30, java.util.concurrent.TimeUnit.SECONDS)
      IncrementalIndexer.RunSummary(id, 0, 0, 0, 0, 0, 0, 0)
    }
    val server = AdminServer.start(0, spark, stateDir, logDir,
      runJob = Some(slowRunner))
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      // kick off the long-running job on a background thread
      val job = new Thread(() => post(client, port, "/api/jobs/run?runId=slow"))
      job.start()
      assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "job handler never entered")
      // probes must answer while the run is in flight — with the default
      // single dispatcher thread this would hang until the run finished
      val health = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val r = health.send(HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/healthz"))
        .timeout(java.time.Duration.ofSeconds(5)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, "liveness probe blocked by the running job")
      release.countDown()
      job.join(10000)
    } finally { release.countDown(); server.stop(0) }
  }

  test("corrupted run-log rows degrade to null fields, never a 500") {
    val (_, stateDir, logDir) = fixture()
    // drop a malformed line and a wrong-typed record next to the real logs
    val runsDir = java.nio.file.Paths.get(logDir, "runs")
    java.nio.file.Files.writeString(runsDir.resolve("corrupt-a.json"),
      "{not json at all")
    java.nio.file.Files.writeString(runsDir.resolve("corrupt-b.json"),
      """{"runId": 42, "processed": "many"}""")
    val server = AdminServer.start(0, spark, stateDir, logDir)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      val r = get(client, port, "/api/jobs?sortField=runId&sortOrder=asc")
      assert(r.statusCode() == 200, r.body())
      // the three real runs still list; corrupt rows surface as null-field
      // items (schema'd permissive read), not as a handler failure
      Seq("run-a", "run-b", "run-c").foreach(id =>
        assert(r.body().contains(id), s"$id missing: ${r.body()}"))
    } finally server.stop(0)
  }

  test("binds loopback by default; apiKey gates the mutating endpoints") {
    val (_, stateDir, logDir) = fixture()
    val server = AdminServer.start(0, spark, stateDir, logDir,
      runJob = Some(id => IncrementalIndexer.RunSummary(id, 0, 0, 0, 0, 0, 0, 0)),
      apiKey = Some("s3cret"))
    try {
      assert(server.getAddress.getAddress.isLoopbackAddress,
        s"default bind must be loopback, was ${server.getAddress}")
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      // reads stay open; mutations need the header
      assert(get(client, port, "/api/jobs").statusCode() == 200)
      assert(post(client, port, "/api/jobs/run?runId=r1").statusCode() == 401)
      assert(post(client, port, "/api/files/unblock?parentId=1").statusCode() == 401)
      def postKeyed(pathQuery: String, key: String) =
        client.send(HttpRequest.newBuilder(
            URI.create(s"http://localhost:$port$pathQuery"))
          .header("X-API-KEY", key)
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.ofString())
      assert(postKeyed("/api/jobs/run?runId=r1", "wrong").statusCode() == 401)
      assert(postKeyed("/api/jobs/run?runId=r1", "s3cret").statusCode() == 200)
    } finally server.stop(0)
  }

  test("unblock: validation, 404, and the unblock → reprocess integration") {
    val (indexDir, stateDir, logDir) = fixture()
    val server = AdminServer.start(0, spark, stateDir, logDir)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      assert(post(client, port, "/api/files/unblock").statusCode() == 400)
      assert(post(client, port, "/api/files/unblock?parentId=x").statusCode() == 400)
      assert(post(client, port,
        "/api/files/unblock?parentId=99999999999999999999").statusCode() == 400)
      assert(post(client, port, "/api/files/unblock?parentId=99").statusCode() == 404)
      assert(get(client, port, "/api/files/unblock?parentId=2").statusCode() == 405)
      assert(post(client, port, "/api/files/unblocked?parentId=2").statusCode() == 404)

      // blocked parent 2 sits out a run even when its content changes
      // (parent 1 keeps run-c's text so only parent 2 counts as changed)
      val changed = base +
        (1L -> ("fresh words here " * 9).trim) +
        (2L -> ("brand new content " * 11).trim)
      val rBlocked = IncrementalIndexer.runOnce(
        spark, docs(changed), indexDir, stateDir, "run-x")
      assert(rBlocked.skippedBlocked == 1 && rBlocked.processed == 0)

      val ok = post(client, port, "/api/files/unblock?parentId=2")
      assert(ok.statusCode() == 200 && ok.body().contains("\"status\":\"ok\""))
      val after = get(client, port, "/api/files?blocked=true").body()
      assert(after.contains("\"total\":0"), after)

      // next run picks the parent back up and reprocesses it
      val rAfter = IncrementalIndexer.runOnce(
        spark, docs(changed), indexDir, stateDir, "run-y")
      assert(rAfter.skippedBlocked == 0)
      assert(rAfter.processed == 1, s"unblocked parent must reprocess: $rAfter")
    } finally server.stop(0)
  }
}

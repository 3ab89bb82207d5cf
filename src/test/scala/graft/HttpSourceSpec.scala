package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.pipeline.{HttpDocumentSource, SyncPipeline}
import graft.views.Views
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** The reference sync protocol (BASIC auth, limit/since params,
  * X-Sync-Truncated / X-Sync-Highwater-Mark pagination) against a
  * local in-JVM HTTP server — full S1/S3 parity with zero egress. */
class HttpSourceSpec extends SparkSpec {

  private val docs = Vector(
    """{"$TYPE":"W","DOCUMENT_ID":"a","$VERSION":1,"N":"a1"}""",
    """{"$TYPE":"W","DOCUMENT_ID":"b","$VERSION":1,"N":"b1"}""",
    """{"$TYPE":"W","DOCUMENT_ID":"a","$VERSION":2,"N":"a2"}""")
  private val schemaJson =
    """{"W": {"N": {"ACTIVE": true, "TYPE": "TEXT", "NULLABLE": true}}}"""

  /** Serves `docs` one per page, cursor = index; requires basic auth. */
  private def startServer(): (HttpServer, java.util.concurrent.atomic.AtomicInteger) = {
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fetch/document/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        if (auth == null || !auth.startsWith("Basic ")) {
          ex.sendResponseHeaders(401, -1); ex.close(); return
        }
        if (ex.getRequestURI.getPath.endsWith("/schema")) {
          val body = schemaJson.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body); ex.close(); return
        }
        val q = ex.getRequestURI.getQuery
        val since = q.split("&").collectFirst {
          case p if p.startsWith("since=") => p.drop(6)
        }.getOrElse("")
        val idx = if (since.startsWith("idx")) since.drop(3).toInt else 0
        val (body, hwm, truncated) =
          if (idx < docs.length) (docs(idx) + "\n", s"idx${idx + 1}", idx + 1 < docs.length)
          else ("", since, false)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("X-Sync-Highwater-Mark", hwm)
        ex.getResponseHeaders.set("X-Sync-Truncated", if (truncated) "TRUE" else "FALSE")
        ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    (server, requests)
  }

  test("HTTP sync: pages with highwater cursor, lands all docs, resumes incrementally") {
    val (server, requests) = startServer()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val land = Files.createTempDirectory("graft-http-land").toString + "/landing"
      val state = Files.createTempDirectory("graft-http-state").toString
      val src = new HttpDocumentSource(base, "user", "secret", limit = 1)
      val p = new SyncPipeline(spark, sourceDir = "", landingPath = land, stateDir = state)
      assert(p.syncFrom(src) == 3L)
      assert(p.state.read() == "idx3")
      // incremental: cursor already at the end ⇒ no re-fetch of documents
      assert(p.syncFrom(src) == 0L)
      val landing = spark.read.schema(graft.ingest.Landing.schema).parquet(land)
      assert(landing.count() == 3)
      assert(Views.latest(landing).count() == 2) // a@2, b@1
      assert(requests.get() >= 4) // 3 doc pages + the empty tail page
    } finally server.stop(0)
  }

  test("HTTP schema fetch parses the served RootSchema") {
    val (server, _) = startServer()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val src = new HttpDocumentSource(base, "user", "secret")
      val rs = src.fetchSchema()
      assert(rs.typeNames == Vector("W"))
      assert(rs("W")("N").fieldType == "TEXT")
    } finally server.stop(0)
  }
}

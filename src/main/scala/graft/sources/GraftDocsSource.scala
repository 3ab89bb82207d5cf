package graft.sources

import graft.pipeline.HttpDocumentSource
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.readStream.format("graft_docs")` — the reference's paged
  * sync protocol (/root/reference/src/cmd_sync.go:94-183) as a native
  * DataSource-V2 micro-batch source, replacing the file-landing
  * indirection: the `X-Sync-Highwater-Mark` cursor IS the streaming
  * offset, checkpointed by the engine exactly where the reference
  * persists it after landing a page (cmd_sync.go:175-182 — persist
  * AFTER the page lands, so a crash between land and persist replays
  * the page: at-least-once, absorbed by the R1 landing dedup).
  *
  * Options: `url` (required), `user`/`password` (BASIC auth), `limit`
  * (page size — the unit of driver memory), `calc` (include calculated
  * fields), `max-pages-per-trigger` (admission control: how many pages
  * one micro-batch may absorb; default 100), `initial-cursor`
  * (default "" — the epoch).
  *
  * Scale shape: `latestOffset` walks the cursor chain at most
  * max-pages-per-trigger pages per trigger and caches the fetched
  * lines keyed by (start, end) cursor pair; `planInputPartitions`
  * serves the cache, or — after a restart from the checkpoint, when
  * the cache is gone — REFETCHES the [start, end) cursor range (the
  * protocol is replayable by cursor, which is what makes the offset a
  * valid Spark offset). One InputPartition per fetched page, so
  * per-task memory is bounded by `limit` documents regardless of how
  * far behind the checkpoint is. Output schema: `value STRING` — one
  * NDJSON document per row, the exact lines `Ingest.fromNdjsonLines`
  * parses (schema-on-read happens in the landing projection, not in
  * the wire source, mirroring the reference's reader). */
class GraftDocsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftDocsTable(new CaseInsensitiveStringMap(properties))
}

object GraftDocsSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class GraftDocsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft_docs(${options.getOrDefault("url", "?")})"
  override def schema(): StructType = GraftDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftDocsSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftDocsMicroBatchStream(options)
      }
    }
}

/** The streaming offset: the sync protocol's highwater cursor,
  * verbatim. Equality of cursors = equality of stream positions (the
  * server contract: fetch(since=c) is deterministic for a landed
  * prefix, which is exactly the replayability Spark offsets need). */
case class CursorOffset(cursor: String) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode()
    n.put("cursor", cursor)
    m.writeValueAsString(n)
  }
}

class GraftDocsMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val url = Option(options.get("url")).getOrElse(
    throw new IllegalArgumentException("graft_docs: option 'url' is required"))
  private val limit = options.getInt("limit", 10000)
  private val maxPages = options.getInt("max-pages-per-trigger", 100)
  private val initialCursor = options.getOrDefault("initial-cursor", "")
  private def newSource(): HttpDocumentSource = new HttpDocumentSource(
    url,
    options.getOrDefault("user", ""),
    options.getOrDefault("password", ""),
    limit = limit,
    includeCalcs = options.getBoolean("calc", false))
  @transient private lazy val source = newSource()

  /** Pages fetched by latestOffset, keyed by (startCursor, endCursor):
    * the common path serves planInputPartitions without a second
    * round-trip; a restart (fresh stream instance, cache empty)
    * refetches the committed range instead. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Seq[String]]]()

  /** Walk the cursor chain from `since`, at most `maxPages` pages or
    * until the server reports the tail page. Returns (pages, end). */
  private def fetchChain(since: String): (Seq[Seq[String]], String) = {
    val pages = Seq.newBuilder[Seq[String]]
    var cursor = since
    var n = 0
    var more = true
    while (more && n < maxPages) {
      val page = source.fetchPage(cursor)
      if (page.lines.nonEmpty) pages += page.lines
      // a server that returns an unchanged cursor and no lines is
      // caught up — treat as tail regardless of the truncated flag
      more = page.truncated && (page.cursor != cursor || page.lines.nonEmpty)
      cursor = page.cursor
      n += 1
    }
    (pages.result(), cursor)
  }

  override def initialOffset(): Offset = CursorOffset(initialCursor)

  override def deserializeOffset(json: String): Offset = {
    // minimal parse of {"cursor":"..."} — the only field we write
    val m = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    CursorOffset(m.readTree(json).get("cursor").asText())
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, readLimit: ReadLimit): Offset = {
    val since = start.asInstanceOf[CursorOffset].cursor
    val (pages, end) = fetchChain(since)
    if (end == since && pages.isEmpty) start
    else { cache.put((since, end), pages); CursorOffset(end) }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[CursorOffset].cursor
    val e0 = end.asInstanceOf[CursorOffset].cursor
    if (s0 == e0) return Array.empty
    val pages = Option(cache.get((s0, e0))).getOrElse {
      // restart path: the checkpoint pinned [s0, e0) but the fetch
      // cache died with the previous driver — replay the cursor chain
      // (cmd_sync.go:175-182's at-least-once window, made exact by the
      // engine's offset log)
      val replay = Seq.newBuilder[Seq[String]]
      var cursor = s0
      var guard = 0
      while (cursor != e0 && guard < maxPages + 1) {
        val page = source.fetchPage(cursor)
        if (page.lines.nonEmpty) replay += page.lines
        if (page.cursor == cursor && page.lines.isEmpty) guard = maxPages + 1
        cursor = page.cursor
        guard += 1
      }
      replay.result()
    }
    pages.map(lines => GraftDocsPartition(lines.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory

  override def commit(end: Offset): Unit = {
    val e0 = end.asInstanceOf[CursorOffset].cursor
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._2 == e0) it.remove()
  }

  override def stop(): Unit = ()
}

/** One fetched page, shipped whole to its reader task — `limit`
  * documents of driver/task memory, the sync protocol's own unit. */
case class GraftDocsPartition(lines: Array[String]) extends InputPartition

class GraftDocsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val lines = partition.asInstanceOf[GraftDocsPartition].lines
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}

package graft.llm

import graft.queries.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** [EXT] Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted by a per-partition pipeline.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC STAND-IN for a real decoder (it treats
  * the payload bytes as the "decoded" sample stream). Everything around
  * it — the binary column, the metadata struct, the typed Dataset +
  * mapPartitions batch shape, the partition-parallel execution — is the
  * real plumbing a codec would plug into: swap `decodeStub` for an
  * actual JNI/Java decoder and nothing else changes.
  *
  * Scale notes: mapPartitions processes a whole input split per task
  * (one decoder instance per partition, not per row, mirroring how an
  * expensive codec or model handle should be amortized); the pipeline
  * is a narrow map — no shuffle — so it scales with input splits. The
  * feature outputs are plain integer/double facts about the payload
  * bytes, so the DuckDB oracle can verify the whole path end-to-end
  * from the source text.
  */
object Multimodal {

  /** One multimodal row: payload + metadata (the "image"). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      head_byte: Long,
      checksum16: Long,
      n_frames: Long,
      frame_mean: Double)

  /** STUB decoder: a real build would decode image/audio bytes here
    * (e.g. via javax.imageio / a JNI codec). Deterministic stand-in:
    * the payload bytes ARE the decoded samples. */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** Per-partition feature extraction over decoded samples:
    * byte stats, a 16-byte header checksum, and every-64th-byte "frame"
    * sampling (the video-frame-sample pattern). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = decodeStub(r.payload)
        val n = bytes.length
        val head = if (n > 0) bytes(0) & 0xff else -1
        var ck = 0L
        var i = 0
        while (i < math.min(16, n)) { ck += bytes(i) & 0xff; i += 1 }
        var fSum = 0L; var fCnt = 0L; var j = 0
        while (j < n) { fSum += bytes(j) & 0xff; fCnt += 1; j += 64 }
        MediaFeatures(r.doc_id, n.toLong, head.toLong, ck, fCnt,
          if (fCnt > 0) fSum.toDouble / fCnt.toDouble else 0.0)
      }
    }
  }

  /** documents.text → binary payload (stand-in for an image/audio blob
    * column; the bytes are the UTF-8 encoding so the oracle can verify
    * the full binary path). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism) // one file ⇒ rebalance
      .selectExpr("doc_id", "encode(text, 'UTF-8') as payload",
        "'application/octet-stream' as mime")
      .as[MediaRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary decode → feature extraction via per-partition pipeline
    "x15_media_features" -> { (s, dir) =>
      extractFeatures(mediaTable(s, dir)).toDF().orderBy("doc_id")
    },
    // TILING (the image-patch / video-frame-slice pattern): each payload
    // is cut into fixed 32-byte tiles addressed by index; per-tile
    // fingerprints are computed in the same narrow map — one row per
    // tile via posexplode, no shuffle until the presentation sort. This
    // is the plumbing shape of patch-based vision preprocessing: swap
    // md5-of-slice for a real patch encoder and the plan is unchanged.
    // Corpus is ASCII, so the oracle recomputes tiles from the text.
    "x27_tile_fingerprints" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter("length(text) > 0")
        .selectExpr("doc_id",
          "posexplode(transform(sequence(0, cast(ceil(length(text) / 32.0d) as int) - 1), i -> substring(text, i * 32 + 1, 32))) as (tile_idx, tile)")
        .selectExpr("doc_id", "cast(tile_idx as bigint) as tile_idx",
          "cast(length(tile) as bigint) as tile_bytes", "md5(tile) as tile_md5")
        .orderBy("doc_id", "tile_idx")
    },
  )

  // The oracle recomputes the same facts from the source text (ASCII
  // corpus ⇒ 1 char = 1 byte; code points = byte values). Empty-text rows
  // are guarded: DuckDB's list_sum over an empty range is NULL and the
  // frame_mean division would be NULL/0, but the Spark plan emits 0 /
  // 0.0 — COALESCE + CASE keep the parity contract on arbitrary corpora.
  val oracleSql: Map[String, String] = Map(
    "x15_media_features" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN strlen(text) > 0 THEN ascii(substring(text, 1, 1)) ELSE -1 END AS BIGINT) AS head_byte,
        |  COALESCE(CAST(list_sum(list_transform(range(1, least(16, strlen(text)) + 1),
        |       i -> ascii(substring(text, i, 1)))) AS BIGINT), 0) AS checksum16,
        |  CAST(length(range(1, strlen(text) + 1, 64)) AS BIGINT) AS n_frames,
        |  CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
        |    CAST(list_sum(list_transform(range(1, strlen(text) + 1, 64),
        |         i -> ascii(substring(text, i, 1)))) AS DOUBLE)
        |      / CAST(length(range(1, strlen(text) + 1, 64)) AS BIGINT) END AS frame_mean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x27_tile_fingerprints" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS tile_idx,
        |  CAST(strlen(substring(text, CAST(i * 32 + 1 AS INT), 32)) AS BIGINT) AS tile_bytes,
        |  md5(substring(text, CAST(i * 32 + 1 AS INT), 32)) AS tile_md5
        |FROM (SELECT doc_id, text, unnest(range(0, CAST(ceil(strlen(text) / 32.0) AS BIGINT))) AS i
        |      FROM documents WHERE strlen(text) > 0)
        |ORDER BY doc_id, tile_idx""".stripMargin,
  )
}

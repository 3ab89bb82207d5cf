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
    // MEDIA NEAR-DUP (perceptual-dedup plumbing): payloads whose
    // DISTINCT tile-fingerprint sets overlap — the re-encoded/cropped
    // image analogue of text shingle jaccard, over x27's tiles. Same
    // scale discipline as the text stack: byte-identical payloads
    // collapse to representatives FIRST (copies share every tile —
    // without this the bucket pair counts go quadratic in the copy
    // factor), candidates come from a df-pruned inverted index
    // (posting lists ≤ 8 expand to pairs locally, ≥ 2 shared tiles),
    // and the jaccard is exact integer set arithmetic on candidates
    // only. Swap md5-of-slice for a perceptual patch hash and the
    // plan is unchanged.
    "x55_media_neardup" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val base = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .filter("length(text) > 0")
      val reps = base.selectExpr("doc_id", "md5(text) as pfp")
        .groupBy("pfp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val tiles = graft.queries.Shared.temp(base.join(reps, "doc_id")
        .selectExpr("doc_id",
          "explode(array_distinct(transform(sequence(0, cast(ceil(length(text) / 32.0d) as int) - 1), i -> md5(substring(text, i * 32 + 1, 32))))) as tfp"))
      // candidate recall from rare tiles; exact-intersection verify over
      // the FULL tile sets on candidates only (the x10 discipline)
      val pairs = tiles.groupBy("tfp")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")).between(2, 8))
        .selectExpr("posexplode(ids) as (i, doc_a)", "ids")
        .selectExpr("doc_a", "explode(slice(ids, i + 2, size(ids))) as doc_b")
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared_rare"))
        .filter(col("shared_rare") >= 2)
        .select("doc_a", "doc_b")
      val sets = tiles.groupBy("doc_id")
        .agg(collect_set(col("tfp")).as("ts"))
      pairs
        .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")), "doc_b")
        .selectExpr("doc_a", "doc_b",
          "cast(size(array_intersect(ta, tb)) as bigint) as shared_tiles",
          "size(ta) as na", "size(tb) as nb")
        .selectExpr("doc_a", "doc_b", "shared_tiles",
          graft.llm.Frag.sRound6("cast(shared_tiles as double) / cast(na + nb - shared_tiles as double)") + " as tile_jaccard")
        .filter("tile_jaccard >= 0.5")
        .orderBy("doc_a", "doc_b")
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
    "x55_media_neardup" ->
      s"""WITH reps AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |              WHERE strlen(text) > 0 GROUP BY md5(text)),
         |tiles AS (
         |  SELECT DISTINCT d.doc_id, md5(substring(text, CAST(i*32+1 AS INT), 32)) AS tfp
         |  FROM (SELECT doc_id, text, unnest(range(0, CAST(ceil(strlen(text)/32.0) AS BIGINT))) AS i
         |        FROM documents WHERE strlen(text) > 0) d JOIN reps USING (doc_id)),
         |rare AS (SELECT tfp FROM (SELECT tfp, COUNT(*) AS df FROM tiles GROUP BY tfp)
         |         WHERE df BETWEEN 2 AND 8),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM tiles a JOIN rare USING (tfp)
         |              JOIN tiles b ON a.tfp = b.tfp AND a.doc_id < b.doc_id
         |         GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sets AS (SELECT doc_id, list(tfp) AS ts FROM tiles GROUP BY doc_id)
         |SELECT doc_a, doc_b, shared_tiles, tile_jaccard FROM (
         |  SELECT doc_a, doc_b,
         |    CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT) AS shared_tiles,
         |    ${graft.llm.Frag.dRound6("CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE) / CAST(len(x.ts) + len(y.ts) - len(list_intersect(x.ts, y.ts)) AS DOUBLE)")} AS tile_jaccard
         |  FROM cand JOIN sets x ON cand.doc_a = x.doc_id
         |            JOIN sets y ON cand.doc_b = y.doc_id)
         |WHERE tile_jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
  )
}

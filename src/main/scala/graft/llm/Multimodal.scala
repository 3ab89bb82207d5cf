package graft.llm

import graft.queries.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** [EXT] Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted by a per-partition pipeline.
  *
  * The payloads are REAL images in a real format — binary P6 PPM
  * (netpbm), built deterministically from the corpus text (the
  * container has no photo corpus, so the pixel buffer is the text's
  * bytes; the format, header, and parser are the genuine article).
  * `decodePpm` is an actual decoder: magic check, comment and
  * whitespace skipping, dimension/maxval parsing, pixel-buffer length
  * validation. Swap it for a JPEG/PNG/audio codec and nothing else in
  * the pipeline changes — the binary column, the typed Dataset +
  * mapPartitions batch shape, and the partition-parallel execution are
  * exactly the plumbing such a codec plugs into.
  *
  * Scale notes: mapPartitions processes a whole input split per task
  * (one decoder instance per partition, not per row, mirroring how an
  * expensive codec or model handle should be amortized); the pipeline
  * is a narrow map — no shuffle — so it scales with input splits. The
  * image construction is deterministic from the text, so the DuckDB
  * oracle verifies the decoded facts (dimensions, per-channel means)
  * end-to-end from the source column.
  */
object Multimodal {

  /** One multimodal row: payload + metadata (the "image"). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Decoded-image features: dimensions and per-channel pixel means. */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      maxval: Int,
      n_pixels: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Fixed image width; height grows with the payload. */
  private val W = 16

  /** Encode raw bytes as a binary P6 PPM: real header (with a comment
    * line — decoders must skip those) + the bytes as an RGB pixel
    * buffer, zero-padded to width 16 × height ⌈n/48⌉ (min 1 row). */
  def encodePpm(docId: Long, raw: Array[Byte]): Array[Byte] = {
    val h = math.max(1, math.ceil(raw.length / (W * 3.0)).toInt)
    val header = s"P6\n# graft synthetic doc $docId\n$W $h\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + W * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(raw, 0, out, header.length, raw.length)
    out
  }

  /** Real P6 PPM decoder: returns (width, height, maxval, pixels).
    * Parses the netpbm grammar — `P6`, then three whitespace-separated
    * ASCII integers with `#` comments allowed between tokens, one
    * whitespace byte, then width·height·3 raw bytes. Throws on bad
    * magic, malformed header, or truncated pixel data. */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = 0; var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, "PPM: expected integer in header")
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(w > 0 && h > 0, "PPM: non-positive dimensions")
    require(maxval > 0 && maxval < 256, "PPM: unsupported maxval")
    pos += 1 // exactly one whitespace byte separates header from pixels
    val need = w * h * 3
    require(bytes.length - pos >= need, "PPM: truncated pixel data")
    (w, h, maxval, java.util.Arrays.copyOfRange(bytes, pos, pos + need))
  }

  /** Per-partition decode + feature extraction: parse the image, then
    * per-channel pixel means over the decoded buffer. Integer sums into
    * one double division ⇒ bit-identical to the oracle's replay. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, maxval, px) = decodePpm(r.payload)
        val n = w.toLong * h
        val sums = new Array[Long](3)
        var i = 0
        while (i < px.length) { sums(i % 3) += px(i) & 0xff; i += 1 }
        MediaFeatures(r.doc_id, w, h, maxval, n,
          sums(0).toDouble / n.toDouble,
          sums(1).toDouble / n.toDouble,
          sums(2).toDouble / n.toDouble)
      }
    }
  }

  /** Resized-image features: output dims + per-channel means after
    * nearest-neighbor downsampling. */
  final case class ResizedFeatures(
      doc_id: Long,
      out_w: Int,
      out_h: Int,
      n_pixels: Long,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Nearest-neighbor factor-2 downsample: out(y, x, c) = in(2y, 2x, c).
    * The standard pre-model thumbnail step — a real pixel-space kernel
    * (row-major index arithmetic over the decoded buffer), not a
    * metadata rewrite. Output dims ⌈w/2⌉ × ⌈h/2⌉. */
  def resizeHalf(w: Int, h: Int, px: Array[Byte]): (Int, Int, Array[Byte]) = {
    val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((2 * y) * w + 2 * x) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = px(src); out(dst + 1) = px(src + 1); out(dst + 2) = px(src + 2)
        x += 1
      }
      y += 1
    }
    (w2, h2, out)
  }

  /** Per-partition decode → resize → feature extraction (the thumbnail
    * branch of the pipeline): same narrow-map scale shape as
    * [[extractFeatures]], with the resize kernel between decode and
    * stats. Integer sums into one double division ⇒ oracle-exact. */
  def extractResized(media: Dataset[MediaRow]): Dataset[ResizedFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _, px) = decodePpm(r.payload)
        val (w2, h2, out) = resizeHalf(w, h, px)
        val n = w2.toLong * h2
        val sums = new Array[Long](3)
        var i = 0
        while (i < out.length) { sums(i % 3) += out(i) & 0xff; i += 1 }
        ResizedFeatures(r.doc_id, w2, h2, n,
          sums(0).toDouble / n.toDouble,
          sums(1).toDouble / n.toDouble,
          sums(2).toDouble / n.toDouble)
      }
    }
  }

  /** One sampled video frame: index + per-channel means. */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Long,
      frame_rows: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** Rows per synthetic video frame (a 16×4 slice of the pixel grid). */
  private val FrameRows = 4

  /** Frame sampling (the video-preprocessing pattern): treat each
    * payload as a frame sequence — consecutive 16×4 row-blocks of the
    * pixel grid — and keep every `step`-th frame (temporal stride
    * sampling, the standard decode-budget guard for video corpora),
    * emitting per-frame channel means. flatMap in the same narrow
    * per-partition pipeline: one decode per payload serves all its
    * frames, no shuffle until presentation. The last frame may be
    * short (h not divisible by 4) — its mean divides by its REAL pixel
    * count. */
  def sampleFrames(media: Dataset[MediaRow], step: Int = 3): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, _, px) = decodePpm(r.payload)
        val nFrames = (h + FrameRows - 1) / FrameRows
        (0 until nFrames by step).iterator.map { f =>
          val rf = math.min(FrameRows, h - f * FrameRows)
          val n = w.toLong * rf
          val sums = new Array[Long](3)
          val start = f * FrameRows * w * 3
          var i = 0
          while (i < n * 3) { sums(i % 3) += px(start + i) & 0xff; i += 1 }
          FrameFeatures(r.doc_id, f.toLong, rf,
            sums(0).toDouble / n.toDouble,
            sums(1).toDouble / n.toDouble,
            sums(2).toDouble / n.toDouble)
        }
      }
    }
  }

  // ── audio branch: a real RIFF/WAV codec (PCM-8 mono) ──

  /** Decoded-audio features over the sample buffer (unsigned 8-bit PCM:
    * amplitude = sample − 128). */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      mean_amp: Double,
      rms: Double,
      peak_abs: Long)

  /** Encode raw bytes as a real RIFF/WAVE file: `RIFF` size `WAVE`,
    * a spec-complete 16-byte PCM `fmt ` chunk (format 1, mono, 8 kHz,
    * 8-bit), a `LIST` metadata chunk decoders must SKIP (that's what
    * makes chunk-walking real), then `data`. All sizes little-endian,
    * exactly as the RIFF grammar demands. */
  def encodeWav(docId: Long, samples: Array[Byte]): Array[Byte] = {
    val meta = s"INFOdoc $docId".getBytes("US-ASCII")
    val metaPad = meta.length + (meta.length & 1) // RIFF chunks pad to even
    val dataPad = samples.length + (samples.length & 1)
    val riffSize = 4 + (8 + 16) + (8 + metaPad) + (8 + dataPad)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)           // PCM, mono
      .putInt(8000).putInt(8000)         // sample rate, byte rate
      .putShort(1).putShort(8)           // block align, bits/sample
    out.put("LIST".getBytes("US-ASCII")).putInt(meta.length).put(meta)
    if ((meta.length & 1) == 1) out.put(0.toByte)
    out.put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
    if ((samples.length & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Real RIFF/WAV parser: validates `RIFF`/`WAVE` magic, walks the
    * chunk list honoring even-byte padding, reads the PCM `fmt `
    * fields, and returns (sampleRate, samples) from the `data` chunk.
    * Throws on bad magic, missing chunks, or non-PCM-8-mono streams —
    * the same grammar-first rigor as [[decodePpm]]. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(s: String): Unit = {
      val b = new Array[Byte](4); bb.get(b)
      require(new String(b, "US-ASCII") == s, s"WAV: expected '$s'")
    }
    magic("RIFF"); bb.getInt(); magic("WAVE")
    var rate = -1; var data: Array[Byte] = null
    while (bb.remaining() >= 8 && (rate < 0 || data == null)) {
      val id = new Array[Byte](4); bb.get(id)
      val size = bb.getInt()
      require(size >= 0 && bb.remaining() >= size, "WAV: truncated chunk")
      new String(id, "US-ASCII") match {
        case "fmt " =>
          require(size >= 16, "WAV: short fmt chunk")
          val p0 = bb.position()
          require(bb.getShort() == 1, "WAV: not PCM")
          require(bb.getShort() == 1, "WAV: not mono")
          rate = bb.getInt()
          bb.getInt(); bb.getShort() // byte rate, block align
          require(bb.getShort() == 8, "WAV: not 8-bit")
          bb.position(p0 + size + (size & 1))
        case "data" =>
          data = new Array[Byte](size); bb.get(data)
          if ((size & 1) == 1 && bb.remaining() > 0) bb.get()
        case _ => // skip unknown chunks (LIST etc.), honoring padding
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(rate > 0, "WAV: missing fmt chunk")
    require(data != null, "WAV: missing data chunk")
    (rate, data)
  }

  /** Per-partition decode + audio feature extraction: amplitude stats
    * over the PCM-8 buffer (amp = sample − 128). Integer sums into
    * single double ops (one division; one division + sqrt) ⇒
    * oracle-exact. */
  def extractAudio(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (rate, smp) = decodeWav(r.payload)
        val n = math.max(1L, smp.length.toLong)
        var sum = 0L; var sumsq = 0L; var peak = 0L
        var i = 0
        while (i < smp.length) {
          val a = (smp(i) & 0xff) - 128
          sum += a; sumsq += a.toLong * a
          if (math.abs(a) > peak) peak = math.abs(a)
          i += 1
        }
        AudioFeatures(r.doc_id, rate, smp.length.toLong,
          sum.toDouble / n.toDouble,
          math.sqrt(sumsq.toDouble / n.toDouble), peak)
      }
    }
  }

  /** documents.text → WAV payload (text bytes as PCM-8 samples). */
  def audioTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, encodeWav(id, text.getBytes("UTF-8")), "audio/wav")
      }
  }

  /** documents.text → P6 PPM payload (the corpus text's bytes as the
    * pixel buffer, so the oracle can verify the full decode path from
    * the source column). */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism) // one file ⇒ rebalance
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, encodePpm(id, text.getBytes("UTF-8")),
          "image/x-portable-pixmap")
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary decode → feature extraction via per-partition pipeline
    "x15_media_features" -> { (s, dir) =>
      extractFeatures(mediaTable(s, dir)).toDF().orderBy("doc_id")
    },
    // decode → nearest-neighbor half-resize → features: the thumbnail
    // branch every vision-pretraining pipeline runs before the model
    // sees a pixel. Same narrow-map shape as x15 with a real pixel-
    // space kernel in the middle.
    "x77_media_resize" -> { (s, dir) =>
      extractResized(mediaTable(s, dir)).toDF().orderBy("doc_id")
    },
    // decode → temporal stride sampling → per-frame features: the
    // video form of the same pipeline — every 3rd 16×4-row frame,
    // one decode amortized over all of a payload's frames.
    "x78_frame_sample" -> { (s, dir) =>
      sampleFrames(mediaTable(s, dir)).toDF().orderBy("doc_id", "frame_idx")
    },
    // decode → amplitude statistics: the audio branch — a real RIFF
    // chunk-walking parser (fmt validation, metadata-chunk skipping)
    // in the same narrow per-partition pipeline.
    "x79_audio_features" -> { (s, dir) =>
      extractAudio(audioTable(s, dir)).toDF().orderBy("doc_id")
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
      // ONE corpus pass (was three: a reps-derivation scan, a base scan,
      // and a full-text round-robin of each): the rep collapse and the
      // rep's text travel in the same md5(text)-keyed aggregation —
      // min_by(text, doc_id) is exactly the representative's own text
      // (identical to the old base⋈reps join, md5-collision behavior
      // included, since the group key stays md5). The map-side partial
      // agg collapses byte-identical copies before the exchange, so on
      // duplicated corpora only ~one copy of each distinct content ever
      // ships; the repartition then spreads the surviving reps' text for
      // parallel tile hashing (the single-file test corpus scans at
      // row-group parallelism). NOTE: raw-text md5, NOT the normalized
      // doc_fp tier — x55's oracle groups on md5(text).
      val tiles = graft.queries.Shared.temp(
        t(s, dir, "documents").filter("length(text) > 0")
          .groupBy(expr("md5(text)").as("pfp"))
          .agg(min(col("doc_id")).as("doc_id"),
            expr("min_by(text, doc_id)").as("text"))
          .repartition(s.sparkContext.defaultParallelism)
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

  // The oracle rebuilds the image arithmetic from the source text (ASCII
  // corpus ⇒ 1 char = 1 byte; code points = byte values): width is fixed
  // at 16, height = ⌈n/48⌉ (min 1), the pixel buffer is the text bytes
  // zero-padded to 16·h·3, and channel c's pixels are text positions
  // c+1, c+4, … (1-based; padding contributes 0 to the sum but counts
  // in the 16·h denominator). Integer sums into one double division on
  // both engines ⇒ bit-identical means.
  val oracleSql: Map[String, String] = Map(
    "x15_media_features" -> {
      val h = "greatest(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT))"
      def mean(c: Int) =
        s"""CAST(COALESCE(list_sum(list_transform(range(${c + 1}, strlen(text) + 1, 3),
           |    i -> ascii(substring(text, i, 1)))), 0) AS DOUBLE)
           |  / CAST(16 * $h AS DOUBLE)""".stripMargin
      s"""SELECT doc_id,
         |  16 AS width,
         |  CAST($h AS INT) AS height,
         |  255 AS maxval,
         |  CAST(16 * $h AS BIGINT) AS n_pixels,
         |  ${mean(0)} AS mean_r,
         |  ${mean(1)} AS mean_g,
         |  ${mean(2)} AS mean_b
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // audio oracle: sample i is the text's i-th byte (ASCII corpus),
    // amplitude = byte − 128; integer sums into one division (mean),
    // one division + sqrt (rms) — identical single float ops on
    // identical exact operands
    "x79_audio_features" -> {
      val amp = "ascii(substring(text, CAST(i AS INT), 1)) - 128"
      s"""SELECT doc_id, 8000 AS sample_rate,
         |  CAST(strlen(text) AS BIGINT) AS n_samples,
         |  CAST(s AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean_amp,
         |  sqrt(CAST(sq AS DOUBLE) / CAST(n1 AS DOUBLE)) AS rms,
         |  CAST(pk AS BIGINT) AS peak_abs
         |FROM (SELECT doc_id, text, greatest(1, strlen(text)) AS n1,
         |        COALESCE(list_sum(list_transform(range(1, strlen(text) + 1),
         |          i -> $amp)), 0) AS s,
         |        COALESCE(list_sum(list_transform(range(1, strlen(text) + 1),
         |          i -> ($amp) * ($amp))), 0) AS sq,
         |        COALESCE(list_max(list_transform(range(1, strlen(text) + 1),
         |          i -> abs($amp))), 0) AS pk
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
    // resize oracle: out(y,x,c) = in(2y,2x,c); source pixel index
    // 32·y + 2·x, channel c at text position 3·pix + c + 1 (1-based),
    // zero beyond the text (padding)
    "x77_media_resize" -> {
      val h = "greatest(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT))"
      val h2 = s"(($h + 1) // 2)"
      def mean(c: Int) =
        s"""CAST(COALESCE(list_sum(list_transform(range(0, 8 * $h2), k ->
           |    CASE WHEN 3 * (32 * (k // 8) + 2 * (k % 8)) + ${c + 1} <= strlen(text)
           |         THEN ascii(substring(text, CAST(3 * (32 * (k // 8) + 2 * (k % 8)) + ${c + 1} AS INT), 1))
           |         ELSE 0 END)), 0) AS DOUBLE) / CAST(8 * $h2 AS DOUBLE)""".stripMargin
      s"""SELECT doc_id,
         |  8 AS out_w,
         |  CAST($h2 AS INT) AS out_h,
         |  CAST(8 * $h2 AS BIGINT) AS n_pixels,
         |  ${mean(0)} AS mean_r,
         |  ${mean(1)} AS mean_g,
         |  ${mean(2)} AS mean_b
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    // frame oracle: frame f = pixel rows [4f, 4f+rf), rf = min(4, h−4f);
    // frame pixels are row-major contiguous from pixel 64·f, so channel
    // c sums text positions 3·(64·f + k) + c + 1, k < 16·rf
    "x78_frame_sample" -> {
      def mean(c: Int) =
        s"""CAST(COALESCE(list_sum(list_transform(range(0, 16 * rf), k ->
           |    CASE WHEN 3 * (64 * f + k) + ${c + 1} <= strlen(text)
           |         THEN ascii(substring(text, CAST(3 * (64 * f + k) + ${c + 1} AS INT), 1))
           |         ELSE 0 END)), 0) AS DOUBLE) / CAST(16 * rf AS DOUBLE)""".stripMargin
      s"""SELECT doc_id, CAST(f AS BIGINT) AS frame_idx, CAST(rf AS INT) AS frame_rows,
         |  ${mean(0)} AS mean_r, ${mean(1)} AS mean_g, ${mean(2)} AS mean_b
         |FROM (SELECT doc_id, text, f, least(4, h - 4 * f) AS rf
         |      FROM (SELECT doc_id, text, h,
         |              unnest(range(0, (h + 3) // 4, 3)) AS f
         |            FROM (SELECT doc_id, text,
         |                    greatest(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT)) AS h
         |                  FROM documents)))
         |ORDER BY doc_id, frame_idx""".stripMargin
    },
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

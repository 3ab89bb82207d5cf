package graft

import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The P6 PPM codec behind x15: a real netpbm parser (magic, comments,
  * whitespace grammar, truncation checks), round-tripping the encoder,
  * plus the end-to-end decode pipeline on the corpus. */
class PpmSpec extends SparkSpec {

  test("decode(encode(bytes)) round-trips dims, maxval, and padded pixels") {
    for (n <- Seq(0, 1, 47, 48, 49, 1000)) {
      val raw = Array.tabulate(n)(i => ((i * 7 + 3) % 256).toByte)
      val (w, h, maxval, px) = Multimodal.decodePpm(Multimodal.encodePpm(42L, raw))
      assert(w == 16)
      assert(h == math.max(1, math.ceil(n / 48.0).toInt))
      assert(maxval == 255)
      assert(px.length == w * h * 3)
      assert(px.take(n).toSeq == raw.toSeq)        // payload preserved
      assert(px.drop(n).forall(_ == 0))            // zero padding
    }
  }

  test("parser handles the netpbm grammar: comments, arbitrary whitespace") {
    val px = Array.tabulate(2 * 2 * 3)(i => (i + 1).toByte)
    val img = ("P6\n# a comment\n  2 # trailing comment\n\t2\r\n255\n"
      .getBytes("US-ASCII")) ++ px
    val (w, h, maxval, out) = Multimodal.decodePpm(img)
    assert((w, h, maxval) == (2, 2, 255))
    assert(out.toSeq == px.toSeq)
  }

  test("parser rejects bad magic, malformed header, truncated pixels") {
    val px = Array.fill(16 * 1 * 3)(1.toByte)
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P5\n16 1\n255\n".getBytes ++ px) // greyscale magic
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\nxx 1\n255\n".getBytes ++ px) // non-integer dim
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm("P6\n16 1\n255\n".getBytes ++ px.take(10)) // short
    }
  }

  test("channel means: known 2x1 image decodes to exact per-channel values") {
    // pixels: (10,20,30) (50,60,70) → means r=30, g=40, b=50
    val img = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 50, 60, 70)
    val (w, h, _, px) = Multimodal.decodePpm(img)
    val sums = new Array[Long](3)
    px.zipWithIndex.foreach { case (b, i) => sums(i % 3) += b & 0xff }
    val n = w.toLong * h
    assert((sums(0) / n, sums(1) / n, sums(2) / n) == (30L, 40L, 50L))
  }

  test("x15 end-to-end: every doc decodes; facts consistent with the text") {
    val rows = Multimodal.queries("x15_media_features")(spark, sf001).collect()
    val texts = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("doc_id", "length(text) as n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val (id, w, h, maxval, np) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
      assert(w == 16 && maxval == 255)
      assert(h == math.max(1, math.ceil(texts(id) / 48.0).toInt))
      assert(np == w.toLong * h)
      Seq(r.getDouble(5), r.getDouble(6), r.getDouble(7)).foreach { m =>
        assert(m >= 0.0 && m <= 255.0)
      }
    }
  }

  test("resizeHalf: every output pixel equals the source at (2y, 2x)") {
    for ((w, h) <- Seq((16, 1), (16, 2), (16, 5), (2, 2), (3, 3))) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 11 + 5) % 256).toByte)
      val (w2, h2, out) = Multimodal.resizeHalf(w, h, px)
      assert(w2 == (w + 1) / 2 && h2 == (h + 1) / 2)
      assert(out.length == w2 * h2 * 3)
      for (y <- 0 until h2; x <- 0 until w2; c <- 0 until 3)
        assert(out((y * w2 + x) * 3 + c) == px(((2 * y) * w + 2 * x) * 3 + c),
          s"($y,$x,$c) of ${w}x$h")
    }
  }

  test("WAV codec: decode(encode) round-trips rate and samples; odd-length padding") {
    for (n <- Seq(0, 1, 2, 7, 100, 101)) {
      val smp = Array.tabulate(n)(i => ((i * 31 + 9) % 256).toByte)
      val (rate, out) = Multimodal.decodeWav(Multimodal.encodeWav(5L, smp))
      assert(rate == 8000)
      assert(out.toSeq == smp.toSeq, s"n=$n")
    }
  }

  test("WAV parser rejects bad magic, non-PCM, truncation; skips LIST chunks") {
    val good = Multimodal.encodeWav(1L, Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFX".getBytes ++ good.drop(4)) // bad magic
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav(good.dropRight(2)) // truncated data chunk
    }
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = 3 (IEEE float) at fmt offset
    intercept[IllegalArgumentException] { Multimodal.decodeWav(nonPcm) }
    // the LIST chunk sits between fmt and data; decode skipping it is
    // covered by the round-trip above succeeding at all
  }

  test("audio features: known samples give exact mean/rms/peak") {
    import spark.implicits._
    // amplitudes: 100-128=-28, 128-128=0, 156-128=28 → mean 0,
    // rms sqrt((784+0+784)/3), peak 28
    val smp = Array[Byte](100.toByte, 128.toByte, 156.toByte)
    val media = Seq(Multimodal.MediaRow(3L,
      Multimodal.encodeWav(3L, smp), "audio/wav")).toDS()
    val f = Multimodal.extractAudio(media).collect().head
    assert(f.sample_rate == 8000 && f.n_samples == 3)
    assert(f.mean_amp == 0.0)
    assert(f.rms == math.sqrt(1568.0 / 3.0))
    assert(f.peak_abs == 28L)
  }

  test("sampleFrames: stride-3 indices, short last frame, exact means") {
    import spark.implicits._
    // 11 pixel rows → 3 frames (rows 4, 4, 3); stride 3 keeps frame 0 only;
    // 21 rows → 6 frames, keeps 0 and 3
    for (nRows <- Seq(11, 21)) {
      val raw = Array.tabulate(16 * nRows * 3)(i => ((i * 13 + 1) % 256).toByte)
      val media = Seq(Multimodal.MediaRow(7L,
        Multimodal.encodePpm(7L, raw), "image/x-portable-pixmap")).toDS()
      val got = Multimodal.sampleFrames(media).collect().sortBy(_.frame_idx)
      val nFrames = (nRows + 3) / 4
      val expIdx = (0 until nFrames by 3).map(_.toLong)
      assert(got.map(_.frame_idx).toSeq == expIdx)
      got.foreach { fr =>
        val rf = math.min(4, nRows - fr.frame_idx.toInt * 4)
        assert(fr.frame_rows == rf)
        val start = fr.frame_idx.toInt * 4 * 16 * 3
        val sums = new Array[Long](3)
        (0 until 16 * rf * 3).foreach(i => sums(i % 3) += raw(start + i) & 0xff)
        val n = (16L * rf).toDouble
        assert(fr.mean_r == sums(0) / n && fr.mean_g == sums(1) / n &&
          fr.mean_b == sums(2) / n, s"frame ${fr.frame_idx} of $nRows rows")
      }
    }
  }
}

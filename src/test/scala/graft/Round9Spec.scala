package graft

/** In-memory references for the round-6 retrieval/featurizer trio:
  * x90 BM25 top-20, x91 feature-hashing vectors, x92 PMI collocations.
  *
  * Each reference recomputes the answer from the raw `documents` rows
  * with plain Scala collections, replicating the engine's exact
  * arithmetic (decimal-cast rounding, md5-based 60-bit hashing,
  * left-to-right folds) so every equality below is exact — no
  * tolerances. */
class Round9Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def toks(t: String): Array[String] =
    t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)

  private def docTexts(): Array[(Long, String)] =
    graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("x90 BM25 top-20 matches an exact-decimal reference ranking") {
    val docs = docTexts()
    val qTerms = Seq("spark", "window", "merge", "vector", "hash")
    val tf = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val avgdl = dl.values.sum.toDouble / dl.size.toDouble
    val df = qTerms.map(q => q -> tf.values.count(_.contains(q)).toLong).toMap
    val n = docs.length.toDouble
    val ref = tf.toSeq.flatMap { case (id, m) =>
      val hits = qTerms.filter(m.contains)
      if (hits.isEmpty) None
      else {
        val sum = hits.map { q =>
          val idf = math.log(1.0 + (n - df(q).toDouble + 0.5) / (df(q).toDouble + 0.5))
          val s = idf * (m(q).toDouble * 2.2) /
            (m(q).toDouble + 1.2 * (0.25 + 0.75 * dl(id).toDouble / avgdl))
          BigDecimal(s).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some((id, hits.length.toLong, round6(sum.toDouble)))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)
    assert(ref.length == 20, "fixture must match ≥20 docs on the query terms")
    val out = graft.llm.TextAnalysis.queries("x90_bm25")(spark, sf001).collect()
    assert(out.length == ref.length)
    out.zip(ref).zipWithIndex.foreach { case ((o, (id, nt, s)), i) =>
      assert(o.getLong(0) == i + 1L, s"rank at $i")
      assert(o.getLong(1) == id, s"doc at rank ${i + 1}")
      assert(o.getLong(2) == nt, s"n_terms of $id")
      assert(o.getDouble(3) == s, s"score of $id")
    }
    // scores must actually discriminate (not all-equal ranking)
    assert(ref.map(_._3).distinct.length > 1)
  }

  test("x91 feature-hash vectors: integer-exact nnz/l2/checksum per doc") {
    val docs = docTexts()
    val out = graft.llm.TextAnalysis.queries("x91_feature_hash")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == docs.length)
    var collisions = 0
    docs.foreach { case (id, t) =>
      val tfm = toks(t).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val byDim = tfm.toSeq.map { case (tok, c) =>
        val w = if ((h64("fs_" + tok) & 1L) == 1L) c else -c
        (h64(tok) & 63L) -> w
      }.groupBy(_._1).map { case (d, ws) => d -> ws.map(_._2).sum }
        .filter(_._2 != 0L)
      if (byDim.size < tfm.size) collisions += 1
      val nnz = byDim.size.toLong
      val ssq = byDim.values.map(w => w * w).sum
      val chk = byDim.map { case (d, w) => d * w }.sum
      val o = out(id)
      assert(o.getLong(1) == nnz, s"nnz of $id")
      assert(o.getDouble(2) == round6(math.sqrt(ssq.toDouble)), s"l2 of $id")
      assert(o.getLong(3) == chk, s"checksum of $id")
    }
    // 64 dims over a larger vocabulary: the hashing trick's collisions
    // must actually occur, or the test exercises nothing interesting
    assert(collisions > 0, "no dimension collisions — widen the fixture")
  }

  test("x93 winnowing pairs match a first-principles reference") {
    val docs = docTexts()
    def fps(t: String): Set[Long] = {
      val tk = toks(t)
      if (tk.length < 3) {
        if (tk.isEmpty) Set.empty
        else Set.empty // no 3-gram => no hash => excluded upstream
      } else {
        val hs = tk.sliding(3).map(g => h64(g.mkString(" "))).toArray
        if (hs.length >= 4) hs.sliding(4).map(_.min).toSet
        else Set(hs.min)
      }
    }
    val byDoc = docs.map { case (id, t) => id -> fps(t) }.filter(_._2.nonEmpty)
    val df = byDoc.flatMap(_._2).groupBy(identity)
      .map { case (fp, xs) => fp -> xs.length }
    val rare = df.filter { case (_, d) => d >= 2 && d <= 8 }.keySet
    val ids = byDoc.toMap
    val sortedDocs = byDoc.sortBy(_._1)
    val ref = (for {
      i <- sortedDocs.indices
      j <- (i + 1) until sortedDocs.length
      (a, fa) = sortedDocs(i)
      (b, fb) = sortedDocs(j)
      shared = fa.intersect(fb)
      if shared.count(rare) >= 2
      ov = round6(shared.size.toDouble / math.min(fa.size, fb.size).toDouble)
      if ov >= 0.5
    } yield (a, b, fa.size.toLong, fb.size.toLong, shared.size.toLong, ov))
      .sortBy(p => (p._1, p._2))
    assert(ref.nonEmpty, "dup fixture must produce winnowing pairs")
    val out = graft.llm.Dedup.queries("x93_winnowing")(spark, sf001).collect()
    assert(out.length == ref.length)
    out.zip(ref).foreach { case (o, (a, b, na, nb, sh, ov)) =>
      assert(o.getLong(0) == a && o.getLong(1) == b, s"pair ($a,$b)")
      assert(o.getLong(2) == na && o.getLong(3) == nb, s"fp sizes of ($a,$b)")
      assert(o.getLong(4) == sh, s"shared of ($a,$b)")
      assert(o.getDouble(5) == ov, s"overlap of ($a,$b)")
    }
    // the winnowing guarantee on the fixture's exact dup pairs: full
    // containment => overlap exactly 1.0 for at least one pair
    assert(ref.exists(_._6 == 1.0), "no fully-overlapping dup pair")
    // density sanity: expected ~2/(w+1) of gram count, never above 1
    byDoc.foreach { case (id, f) =>
      val tkn = toks(docs.find(_._1 == id).get._2).length
      assert(f.size <= math.max(tkn - 2, 1), s"fp density of $id")
    }
  }

  test("x94 probe weights match exact 3-epoch reference; probe learns") {
    val rows = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // signed-hash BIGRAM features into 256 dims (see x94's scaladoc:
    // unigram features cap at 0.618 accuracy on this fixture — the
    // languages share one vocabulary and differ in token order)
    val feats: Map[Long, Map[Long, Long]] = rows.map { case (id, t, _) =>
      val tk = toks(t)
      val bgs =
        if (tk.length >= 2) tk.sliding(2).map(p => p(0) + " " + p(1)).toSeq
        else Seq.empty[String]
      id -> bgs.groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }.toSeq
        .map { case (bg, c) =>
          val w = if ((h64("fs_" + bg) & 1L) == 1L) c else -c
          (h64(bg) & 255L) -> w
        }.groupBy(_._1).map { case (d, ws) => d -> ws.map(_._2).sum }
        .filter(_._2 != 0L)
    }.toMap
    val y = rows.map { case (id, _, l) => id -> (if (l == "en") 1.0 else 0.0) }.toMap
    val n = rows.length.toDouble
    def d6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var w: Map[Long, BigDecimal] = (-1L to 255L).map(_ -> BigDecimal(0).setScale(6)).toMap
    def zOf(id: Long, wm: Map[Long, BigDecimal]): Double = {
      val zs = feats(id).map { case (d, x) => wm(d) * BigDecimal(x) }
        .foldLeft(BigDecimal(0))(_ + _)
      (zs + wm(-1L)).toDouble
    }
    for (_ <- 1 to 3) {
      val p = rows.map { case (id, _, _) =>
        val z = zOf(id, w)
        id -> 0.5 * (1.0 + z / (1.0 + math.abs(z)))
      }.toMap
      val gd = rows.flatMap { case (id, _, _) =>
        feats(id).map { case (d, x) => d -> d12((p(id) - y(id)) * x.toDouble) }
      }.groupBy(_._1).map { case (d, gs) => d -> gs.map(_._2).sum }
      val gb = rows.map { case (id, _, _) => d12(p(id) - y(id)) }.sum
      w = w.map { case (d, wv) =>
        val gs = if (d == -1L) gb else gd.getOrElse(d, BigDecimal(0))
        d -> d6(wv.toDouble - 1.0 * gs.toDouble / n)
      }
    }
    val out = graft.llm.TextAnalysis.queries("x94_linear_probe")(spark, sf001)
      .collect()
    assert(out.length == 257)
    out.foreach { o =>
      val d = o.getLong(0)
      assert(o.getDouble(1) == w(d).toDouble, s"weight of dim $d")
    }
    // the probe must actually learn: sign(z) accuracy after training
    // beats the majority-class baseline on the fixture
    val acc = rows.count { case (id, _, _) =>
      (zOf(id, w) > 0.0) == (y(id) == 1.0)
    }.toDouble / n
    val base = math.max(y.values.sum, n - y.values.sum) / n
    assert(acc > base, s"probe accuracy $acc <= baseline $base")
    assert(w.values.count(_.abs > 0) > 128, "probe weights mostly zero")
  }

  test("x92 PMI collocations match a first-principles top-20") {
    val docs = docTexts()
    val uni = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val uTot = uni.values.sum.toDouble
    val bigrams = docs.flatMap { d =>
      val tk = toks(d._2)
      if (tk.length >= 2) tk.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }
    val bTot = bigrams.length.toDouble
    val ref = bigrams.groupBy(identity)
      .map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= 5L)
      .toSeq.map { case ((a, b), cab) =>
        val pmi = math.log((cab.toDouble / bTot) /
          ((uni(a).toDouble / uTot) * (uni(b).toDouble / uTot)))
        (a, b, cab, round6(pmi))
      }
      .sortBy { case (a, b, _, p) => (-p, a, b) }.take(20)
    assert(ref.nonEmpty, "fixture has no bigram with count >= 5")
    val out = graft.llm.TextAnalysis.queries("x92_pmi_collocations")(spark, sf001)
      .collect()
    assert(out.length == ref.length)
    out.zip(ref).zipWithIndex.foreach { case ((o, (a, b, c, p)), i) =>
      assert(o.getLong(0) == i + 1L, s"rank at $i")
      assert(o.getString(1) == a && o.getString(2) == b, s"pair at rank ${i + 1}")
      assert(o.getLong(3) == c, s"count of ($a,$b)")
      assert(o.getDouble(4) == p, s"pmi of ($a,$b)")
    }
  }
}

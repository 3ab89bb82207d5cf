package graft

/** Invariant checks for the round-5 [EXT] queries: bigram LM scoring
  * (x43), DSIR importance weights (x44), MAD length outliers (x45),
  * and containment detection (x46). The oracle gate pins exact values;
  * these pin the semantic contracts a hash compare can't explain. */
class Round5QuerySpec extends SparkSpec {

  test("x43 bigram scores: every doc surfaces; nll >= 0; short docs score 0") {
    val rows = graft.llm.TextAnalysis.queries("x43_bigram_logprob")(spark, sf001)
      .collect()
    val nDocs = graft.queries.Tables.t(spark, sf001, "documents").count()
    assert(rows.length.toLong == nDocs) // left join keeps bigram-free docs
    rows.foreach { r =>
      val (nBg, meanNll) = (r.getLong(1), r.getDouble(2))
      // MLE bigram probability is c(prev,cur)/c(prev,·) <= 1 → -ln >= 0
      assert(meanNll >= 0.0)
      if (nBg == 0L) assert(meanNll == 0.0)
    }
  }

  test("x44 DSIR: target-language docs skew positive vs non-target") {
    val rows = graft.llm.TextAnalysis.queries("x44_dsir_weights")(spark, sf001)
      .collect()
    val (en, rest) = rows.partition(_.getString(1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def meanLw(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(3)).sum / rs.length
    // importance weights must separate the target domain on average —
    // the whole point of the estimator
    assert(meanLw(en) > meanLw(rest))
    // flag agrees with the sign of the log weight
    rows.foreach(r => assert(r.getBoolean(4) == (r.getDouble(3) > 0.0)))
  }

  test("x45 MAD: outlier counts are bounded and stats are per-source exact") {
    val rows = graft.llm.TextAnalysis.queries("x45_length_mad")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (med, mad, nDocs, nOut) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(med > 0L && mad >= 0L)
      assert(nOut >= 0L && nOut < nDocs) // the median itself never flags
    }
    // recompute one source's median by brute force
    val src = rows.head.getString(0)
    val lens = graft.queries.Tables.t(spark, sf001, "documents")
      .filter(org.apache.spark.sql.functions.col("source") === src)
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val expectMed = lens((math.ceil(0.5 * lens.length) - 1).toInt)
    assert(rows.head.getLong(1) == expectMed)
  }

  test("x47 entropy/ttr: information-theoretic bounds hold per doc") {
    val rows = graft.llm.TextAnalysis.queries("x47_entropy_ttr")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCh, kCh, ent) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val (nTypes, nTok, ttr) = (r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(ent >= 0.0)
      // Shannon bound: H <= ln(#distinct symbols) (1e-6 rounding slack)
      if (kCh > 0) assert(ent <= math.log(kCh.toDouble) + 1e-6)
      assert(kCh <= nCh)
      assert(nTypes <= nTok)
      if (nTok > 0) assert(ttr > 0.0 && ttr <= 1.0 + 1e-6)
    }
  }

  test("x48 source overlap: pair counts bounded by per-source set sizes") {
    val rows = graft.llm.Dedup.queries("x48_source_overlap")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sh, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b) // ordered pairs, no diagonal, no mirror
      assert(sh >= 1L && sh <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("x46 containment: superset of symmetric near-dups, bounds hold") {
    val cont = graft.llm.Dedup.queries("x46_containment")(spark, sf001).collect()
    cont.foreach { r =>
      val (ca, cb) = (r.getDouble(2), r.getDouble(3))
      assert(ca > 0.0 && ca <= 1.0 && cb > 0.0 && cb <= 1.0)
      assert(ca >= 0.7 || cb >= 0.7)
    }
    // jaccard >= 0.5 on the same candidate pool implies containment
    // >= 0.5 on BOTH sides — x07 pairs with containment >= 0.7 on
    // either side must therefore reappear here
    val strong = graft.llm.Dedup.queries("x07_lsh_neardup_pairs")(spark, sf001)
      .filter("jaccard >= 0.7").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val contPairs = cont.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.subsetOf(contPairs))
  }
}

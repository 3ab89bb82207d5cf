package graft

/** Invariants for the round-6 curation operators: the x58 funnel (stage
  * algebra a hash compare can't explain) and x59's per-source adaptive
  * quality threshold. */
class CurationSpec extends SparkSpec {

  test("x58 funnel: stages monotone, stage 0 = corpus, stage 1 = exact reps") {
    val rows = graft.llm.Dedup.queries("x58_curation_funnel")(spark, sf001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("all", "exact_dedup", "quality_gate", "near_dedup"))
    val nDocs = rows.map(_.getLong(2))
    val nTok = rows.map(_.getLong(3))
    // attrition is monotone: each stage is a subset of the previous
    assert(nDocs.zip(nDocs.tail).forall { case (a, b) => b <= a })
    assert(nTok.zip(nTok.tail).forall { case (a, b) => b <= a })
    // stage 0 is the whole corpus; stage 1 is the exact-dedup rep count
    // (one row per content fingerprint = x05's output cardinality)
    val corpus = graft.queries.Tables.t(spark, sf001, "documents").count()
    assert(nDocs(0) == corpus)
    val x05 = graft.llm.Dedup.queries("x05_exact_dedup")(spark, sf001).count()
    assert(nDocs(1) == x05)
    // retention: exact ratio of each stage against stage 0
    rows.foreach { r =>
      val expect = math.rint(r.getLong(2).toDouble / corpus * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - expect) < 1e-9)
    }
    assert(rows.last.getLong(2) > 0L) // the funnel keeps something
  }

  test("x60 passage scrub: bounds hold; reconciles with x39's dup measure") {
    val rows = graft.llm.TextAnalysis.queries("x60_passage_scrub")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, nk, nt, kt, frac) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nk >= 0L && nk <= np)
      assert(kt >= 0L && kt <= nt)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // corpus-wide: exactly one instance of each distinct passage survives
    val distinctPassages = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr(s"${graft.llm.Frag.sTokens} as tk")
      .selectExpr("explode(transform(sequence(0, cast(ceil(size(tk) / 16.0) as int) - 1), i -> concat_ws(' ', slice(tk, i * 16 + 1, 16)))) as passage")
      .select("passage").distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctPassages)
    // a doc whose passages are all corpus-unique (x39 dup_ratio = 0)
    // must keep everything
    val clean = graft.llm.TextAnalysis.queries("x39_passage_dedup")(spark, sf001)
      .collect().filter(_.getDouble(3) == 0.0).map(_.getLong(0)).toSet
    assert(clean.nonEmpty)
    rows.filter(r => clean(r.getLong(0)))
      .foreach(r => assert(r.getLong(2) == r.getLong(1)))
  }

  test("plan shapes: no cartesian products; x59's threshold joins broadcast") {
    // the funnel and the scrub compose keyed joins + anti joins only;
    // x59's #sources-row threshold frame must reach the corpus as a
    // broadcast, never a shuffle of the big side
    val plans = Map(
      "x58" -> graft.llm.Dedup.queries("x58_curation_funnel")(spark, sf001),
      "x59" -> graft.llm.TextAnalysis.queries("x59_source_quality_gate")(spark, sf001),
      "x60" -> graft.llm.TextAnalysis.queries("x60_passage_scrub")(spark, sf001))
      .map { case (k, df) => k -> df.queryExecution.executedPlan.toString }
    plans.foreach { case (k, p) =>
      assert(!p.contains("CartesianProduct"), s"$k:\n${p.take(2000)}")
    }
    assert(plans("x59").contains("BroadcastHashJoin") ||
      plans("x59").contains("BroadcastNestedLoopJoin"), plans("x59").take(2000))
  }

  test("x59 source gate: threshold keeps >= 60% of each source, bounds hold") {
    val rows = graft.llm.TextAnalysis.queries("x59_source_quality_gate")(
      spark, sf001).collect()
    assert(rows.nonEmpty)
    val nSources = graft.queries.Tables.t(spark, sf001, "documents")
      .select("source").distinct().count()
    assert(rows.length.toLong == nSources)
    rows.foreach { r =>
      val (thr, n, kept, frac) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(thr >= 0.0 && thr <= 1.0) // quality score is a product of ratios
      // the cutoff row is ⌈0.4·n⌉: at least the top 60% survive (ties
      // can only add), and never more than everything
      assert(kept >= n - math.ceil(0.4 * n).toLong + 1)
      assert(kept <= n)
      assert(math.abs(frac - math.rint(kept.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame

/** Round-15 floor diet: the PARAM-LIFTED walk engine (`walkFromMulti` /
  * `nndescentEdgesMultiOn`) fuses a whole operating curve into one
  * traversal by carrying the sweep parameter as a `pk` column. The
  * fusion's entire correctness claim is a rank-prefix identity — the
  * pk = p slice of every fused frame equals the independent per-leg
  * frame — and this spec pins it leg-by-leg against the pre-fusion
  * reference bodies (`gradeWalk(ix, …)` per leg, `nndescentEdgesOn`
  * per degree), which are kept for exactly this purpose.
  */
class WalkFusionSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("x137 fused entry curve == per-leg walkFrom reference, all four budgets") {
    val ix = graft.llm.Similarity.clusteredSliceIndex(spark, sf001)
    val reference = Seq(4, 8, 16, 32).map { e =>
      graft.llm.Similarity.gradeWalk(spark, ix,
        graft.llm.Similarity.hashEntries(spark, ix, e), b = 10,
        "entries", s"cast($e as bigint)")
    }.reduce(_ unionByName _)
    val fused = graft.llm.Similarity.queries("x137_entry_curve")(spark, sf001)
    assert(sortedRows(fused) == sortedRows(reference))
  }

  test("x136 fused seeding A/B == per-leg reference (hash and ivf legs)") {
    val ix = graft.llm.Similarity.clusteredSliceIndex(spark, sf001)
    val reference = graft.llm.Similarity.gradeWalk(spark, ix,
        graft.llm.Similarity.hashEntries(spark, ix, 8), b = 10,
        "seeding", "'hash'")
      .unionByName(graft.llm.Similarity.gradeWalk(spark, ix,
        graft.llm.Similarity.ivfEntries(spark, ix.s10, ix.probes), b = 10,
        "seeding", "'ivf'"))
    val fused = graft.llm.Similarity.queries("x136_ivf_seeded_walk")(
      spark, sf001)
    assert(sortedRows(fused) == sortedRows(reference))
  }

  test("fused NN-Descent: pk = K slice == independent nndescentEdgesOn at K") {
    // the degree sweep's exact construction frame: the 1/10 tuning
    // slice under dense rank ids (x134's body)
    val corpus = {
      import org.apache.spark.sql.functions.col
      graft.queries.ExactRank.withGlobalRank(
          graft.llm.Similarity.withSq(spark, sf001)
            .filter("vec_id % 10 = 0"), Seq(col("vec_id")))
        .selectExpr("rank - 1 as vec_id", "embedding", "sq")
    }
    val fused = graft.llm.Similarity.nndescentEdgesMultiOn(
      spark, corpus, iters = 2, ks = Seq(5, 10))
    Seq(5, 10).foreach { k =>
      val leg = graft.llm.Similarity.nndescentEdgesOn(
        spark, corpus, iters = 2, k = k)
      assert(sortedRows(fused.filter(s"pk = $k").select("src", "dst", "cos"))
        == sortedRows(leg.select("src", "dst", "cos")),
        s"degree $k slice diverged from the independent build")
    }
  }
}

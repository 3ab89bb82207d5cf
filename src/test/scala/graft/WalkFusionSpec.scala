package graft

import org.apache.spark.sql.DataFrame

/** Round-15 floor diet: the PARAM-LIFTED walk engine (`walkFromMulti`)
  * fuses a whole operating curve into one traversal by carrying the
  * sweep parameter as a `pk` column. The fusion's entire correctness
  * claim is a rank-prefix identity — the pk = p slice of every fused
  * frame equals the independent per-leg frame — and this spec pins it
  * leg-by-leg against the pre-fusion reference bodies
  * (`gradeWalk(ix, …)` per leg over `walkFrom`), which are kept for
  * exactly this purpose. (The degree sweeps x134/x135 stay on
  * concurrent per-leg builds — the fused variant was raced and lost at
  * both decades; see SCALE.md and the x134 scaladoc.)
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
}

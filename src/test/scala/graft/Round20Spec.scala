package graft

import graft.llm.Frag._
import org.apache.spark.sql.functions.col

/** Round-14 regressions: integer-keyed shingle shuffles (x48/x57/x64)
  * and the fused HRW kernel (x86).
  *
  * The load-bearing claims:
  *  - `shingles3_h(text)` ≡ element-wise h60 of the distinct string
  *    shingles (fused vs composable parity), so the hashed rewiring of
  *    x48/x57/x64 is a pure key-representation change — the query
  *    RESULTS are invariant because every consumer is equality-only;
  *  - `hrw_assign(key, n)` ≡ the HOF argmax chain, so x86's fused
  *    narrow map assigns identically;
  *  - x86's plan stays one narrow map + a single exchange.
  */
class Round20Spec extends SparkSpec {

  test("shingles3_h (fused) == hashed composable form == h60 of shingles3, element-wise") {
    val d = graft.queries.Tables.t(spark, sf001, "documents")
    val fused = d.selectExpr("doc_id", "shingles3_h(text) as hs")
    val composable = d.selectExpr("doc_id",
      s"${sLet(sTokens, "tk", sShinglesH)} as hs")
    val viaStrings = d.selectExpr("doc_id",
      s"transform(shingles3(text), s3 -> ${sH("s3")}) as hs")
    val a = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = composable.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = viaStrings.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a.nonEmpty && a.values.exists(_.nonEmpty))
    assert(a == b, "fused shingles3_h != composable HOF twin")
    assert(a == c, "fused shingles3_h != h60 over shingles3 strings")
  }

  test("hrw_assign (fused) == composable HOF argmax, both n=8 and n=7") {
    val d = graft.queries.Tables.t(spark, sf001, "documents")
      .select("doc_id")
    val fused = d.selectExpr("doc_id",
      "hrw_assign(cast(doc_id as string), 8) as a8",
      "hrw_assign(cast(doc_id as string), 7) as a7")
    val hof = d
      .selectExpr("doc_id",
        s"transform(sequence(0, 7), w -> ${sH("concat(cast(doc_id as string), ':', cast(w as string))")}) as sc")
      .selectExpr("doc_id", "sc", "array_max(sc) as m8",
        "array_max(slice(sc, 1, 7)) as m7")
      .selectExpr("doc_id",
        "element_at(filter(sequence(0, 7), w -> element_at(sc, w + 1) = m8), 1) as a8",
        "element_at(filter(sequence(0, 6), w -> element_at(sc, w + 1) = m7), 1) as a7")
    val a = fused.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1)
    val b = hof.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b),
      "fused hrw_assign disagrees with the composable argmax")
    // every worker id in range, and both topologies are populated
    assert(a.forall(t => t._2 >= 0 && t._2 < 8 && t._3 >= 0 && t._3 < 7))
  }

  test("x86 plan: fused kernel keeps the narrow-map + single-exchange shape") {
    val df = SparkEntry.queries("x86_rendezvous_shards")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // one aggregation exchange + the presentation sort's range exchange
    assert(exchanges <= 2, s"x86 plan grew extra exchanges:\n$plan")
    assert(!plan.contains("ArrayTransform") || !plan.contains("filter("),
      "x86 hot path still evaluates the interpreted HOF chain")
  }

  test("hashed shingle keys: the x48/x57/x64 exchanges carry bigints, results unchanged vs the string-keyed forms") {
    // x64 df histogram, recomputed with RAW STRING shingle keys —
    // the representation change must be invisible in the output
    import org.apache.spark.sql.functions.{count, lit}
    val strForm = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr(s"${sLet(sTokens, "tk", sShingles)} as shs")
      .selectExpr("explode(shs) as sh")
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n"))
      .collect()
    val strHist = strForm.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hashed = SparkEntry.queries("x64_dedup_pressure")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed == strHist,
      s"x64 df histogram changed under hashed keys: $hashed vs $strHist")
    // and the exchanged key column is a bigint, not a string
    val x57 = SparkEntry.queries("x57_novelty")(spark, sf001)
    assert(x57.collect().length > 0)
    val x48plan = SparkEntry.queries("x48_source_overlap")(spark, sf001)
      .queryExecution.analyzed.toString
    assert(!x48plan.contains("concat(element_at(tk"),
      "x48 still shuffles raw concatenated shingle strings")
  }
}

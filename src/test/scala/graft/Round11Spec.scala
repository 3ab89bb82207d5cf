package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: the V4 FK-reference join (r73) and the composed
  * store lifecycle (r74), each with a plan guard proving the scale
  * shape, plus in-memory correctness references recomputed from the
  * raw fixture with plain Scala collections. */
class Round11Spec extends SparkSpec {

  private def docs() =
    spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "source", "lang", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("r73: FK-reference join values match the fixture-derived reference") {
    val rows = SparkEntry.queries("r73_fk_reference_join")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4))))
    val expect = docs().map { case (id, src, lang, nc) =>
      val ref = if (id % 13 == 0) None else Some(src)
      (id.toString, lang, nc, ref, ref.map(_.toUpperCase))
    }.sortBy(_._1)
    assert(rows.length == expect.length)
    assert(rows.sameElements(expect))
    // both arms of the left join are exercised
    assert(rows.exists(_._4.isEmpty) && rows.exists(_._4.isDefined),
      "fixture must produce both NULL-FK and linked docs")
  }

  test("r73 plan guard: the FK join broadcasts the referenced dimension " +
      "— the corpus side never shuffles on the FK") {
    val plan = graft.queries.DocViews.fkReferenceJoin(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"FK join must be a broadcast hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"FK join must not sort-merge (corpus shuffle on the FK):\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(SOURCE_REF") &&
      !plan.contains("Exchange hashpartitioning(__ref_id"),
      s"no exchange may hash on the FK columns:\n$plan")
  }

  test("r74: lifecycle composition values match the fixture-derived reference") {
    val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
    val rows = SparkEntry.queries("r74_store_lifecycle")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3),
        r.getString(4), r.getLong(5), r.getTimestamp(6), r.getTimestamp(7)))
    val expect = docs().map { case (id, src, lang, nc) =>
      val v2 = id % 10 == 0
      (id.toString, lang, if (v2) nc + 1000 else nc, id % 20 == 0, src,
        if (v2) 2L else 1L, if (v2) ts2 else ts1, if (v2) ts2 else ts1)
    }.sortBy(_._1)
    assert(rows.length == expect.length)
    assert(rows.sameElements(expect))
  }

  test("r74 plan guard: SCD2 history over the bucketed store runs with " +
      "zero hash exchanges") {
    val store = graft.queries.DocViews.bucketedStore(spark, sf001)
    val hist = graft.views.Views.history(store)
    val plan = hist.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"history over a bucketed landing store must be exchange-free:\n$plan")
    assert(hist.count() > 0)
    // control: the same view over the un-bucketed synthetic landing DOES
    // exchange — the guard is not vacuous
    val raw = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("timestamp'2026-01-01 00:00:00' as batch_date",
        "'DOC' as type", "cast(doc_id as string) as id",
        "cast(1 as bigint) as version", "0 as chunk", "source as author",
        "timestamp'2026-01-01 00:00:00' as date", "false as deleted",
        "'{}' as data")
    val ctrl = graft.views.Views.history(raw)
      .queryExecution.executedPlan.toString
    assert(ctrl.contains("Exchange hashpartitioning"),
      "control history unexpectedly exchange-free — guard is vacuous")
  }
}

package graft

/** Plan-shape proofs for the round-5 operators — the properties their
  * scaladoc claims, pinned against the executed plan:
  *  - x49/x51's vectors×codebook products are BROADCAST joins (the
  *    corpus side never shuffles for assignment/encoding);
  *  - x49's ADC scan ranks through the native TopKPerKey operator (no
  *    corpus-wide Window sort);
  *  - x51's assignment collapses through a partial aggregation before
  *    any exchange;
  *  - r58's two windows share ONE exchange (the emulation costs the
  *    same single shuffle a native GROUPS frame would);
  *  - x53 is shuffle-free end to end (presentation sort aside). */
class Round6PlanSpec extends SparkSpec {

  private def planOf(name: String, module: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame]) = {
    val df = module(name)(spark, sf001)
    df.queryExecution.executedPlan.toString
  }

  test("x49 PQ: codebook joins broadcast; ranking is the native top-k") {
    val plan = planOf("x49_pq_ann", graft.llm.Similarity.queries)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("FinalTopK") || plan.contains("PartialTopK"),
      plan.take(2000))
    // the ADC aggregation is two-phase: partial before the exchange
    assert(plan.contains("partial_"), plan.take(2000))
  }

  test("x51 k-means: broadcast assignment + map-side partial min collapse") {
    val plan = planOf("x51_kmeans", graft.llm.Similarity.queries)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("partial_min"), plan.take(2000))
    // no sort-merge join anywhere: every join in the loop is broadcast
    // or collapses to aggregation
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("ExactRank: offset prefix sum joins keyed — no cross product") {
    // the partition-offset frame must reach the corpus via a keyed
    // broadcast join; a BroadcastNestedLoopJoin/CartesianProduct would
    // mean the O(P²) counts-product form regressed
    for (name <- Seq("r38_price_deciles", "x56_training_shards")) {
      val plan = (if (name.startsWith("r"))
        graft.queries.TimeSeries.queries(name)(spark, sf001)
      else graft.llm.TextAnalysis.queries(name)(spark, sf001))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name:\n${plan.take(3000)}")
      assert(!plan.contains("CartesianProduct"), s"$name:\n${plan.take(3000)}")
    }
  }

  test("r58 GROUPS emulation: both windows ride one exchange") {
    val df = graft.queries.Relational.queries("r58_groups_frame")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    // exchanges: one for the user_id windows + the final presentation
    // range sort; the dense_rank and the RANGE frame must NOT each pay
    // their own hash exchange
    val hashExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("x53 within-doc repetition has no exchange except the final sort") {
    val df = graft.llm.TextAnalysis.queries("x53_within_doc_dup")(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}

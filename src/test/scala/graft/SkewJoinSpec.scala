package graft

import org.apache.spark.sql.functions._

/** Proof of SCALE.md §2's residual-skew claim: when a join key is
  * Zipf-skewed and the manual salting pattern (r26) is NOT applied,
  * AQE's OptimizeSkewedJoin detects the oversized shuffle partition at
  * runtime and splits it across tasks — the `skew=true` marker in the
  * final adaptive plan — without changing the result. The spec pins
  * (a) that the split actually fires on a Zipf key, (b) that the
  * result is identical to a skew-free broadcast control, and (c) that
  * the guard is not vacuous (same join with skew handling off shows no
  * marker). */
class SkewJoinSpec extends SparkSpec {

  // key 0 holds ~80% of all rows (the Zipf head); the tail spreads
  // uniformly over 200 keys — one shuffle partition gets > half the
  // fact table, the canonical straggler
  private def fact(n: Long) = spark.range(n).selectExpr(
    "case when id % 100 < 80 then 0L else (id % 200) + 1 end as k",
    "id % 97 as v")
  private def dim() = spark.range(201).selectExpr("id as k", "id * 7 as w")

  private val confs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // thresholds scaled down so the multi-MB hot partition of a test-sized
    // corpus is "skewed" exactly as a multi-GB one is at defaults
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[A](extra: (String, String)*)(body: => A): A = {
    val all = confs ++ extra
    val prev = all.map { case (k, _) => k -> spark.conf.getOption(k) }
    all.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, ov) =>
      ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("OptimizeSkewedJoin splits the Zipf partition and the result " +
      "matches the broadcast control") {
    val n = 2000000L
    val (rows, plan) = withConfs() {
      // global aggregate after the join: no downstream hash-distribution
      // requirement, so the skew split is free to fire (its natural
      // habitat — splitting under a same-key groupBy would force an
      // extra shuffle and OptimizeSkewedJoin declines by design)
      val joined = fact(n).join(dim(), "k")
        .agg(sum(expr("v + w")).as("s"), count(lit(1)).as("cnt"))
      val r = joined.collect()
      (r, joined.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("skew=true"),
      s"AQE must mark the skewed join side as split:\n$plan")
    val control = fact(n).join(broadcast(dim()), "k")
      .agg(sum(expr("v + w")).as("s"), count(lit(1)).as("cnt")).collect()
    assert(rows.head.getLong(0) == control.head.getLong(0) &&
      rows.head.getLong(1) == control.head.getLong(1),
      "skew-split join must not change the aggregate")
  }

  test("control: with skew handling off, the same plan shows no split") {
    val plan = withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val joined = fact(2000000L).join(dim(), "k")
        .agg(sum(expr("v + w")).as("s"))
      joined.collect()
      joined.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("skew=true"),
      "skew marker without skew handling — the positive test is vacuous")
  }
}

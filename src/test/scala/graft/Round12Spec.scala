package graft

import org.apache.spark.sql.functions._

/** Round-9 additions beyond the verdict checklist: the point-in-time
  * join over SCD2 history (r75), DLT priority sampling (x104), and
  * TextRank keyword extraction (x105). Each gets an in-memory
  * correctness reference recomputed from the raw fixture plus a guard
  * on the property that makes the operator worth shipping (exactly-one
  * match, weight-biased inclusion + estimator bounds, damped-score
  * convergence band). */
class Round12Spec extends SparkSpec {

  test("r75: every probe matches exactly ONE history version, and the " +
      "version is the interval the probe falls in") {
    val rows = SparkEntry.queries("r75_pit_join")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2)))
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    // two probes per document, each matching exactly once
    assert(rows.length == 2 * nDocs, s"expected ${2 * nDocs} matches")
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length,
      "a probe matched more than one version")
    rows.foreach { case (id, ts, v) =>
      val expected =
        if (ts.startsWith("2026-01-03") && id.toLong % 10 == 0) 2L else 1L
      assert(v == expected, s"doc $id probe $ts matched v$v, want v$expected")
    }
  }

  test("r75 plan guard: the PIT join is an equi-join on the document " +
      "key (interval containment rides as residual) — never a " +
      "nested-loop/cartesian range join") {
    val plan = SparkEntry.queries("r75_pit_join")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"PIT join must not degrade to a nested-loop join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")
      || plan.contains("ShuffledHashJoin"),
      s"PIT join must be a hash/merge equi-join on the id:\n$plan")
  }

  test("x104: sample is exactly k, inclusion is weight-biased, and the " +
      "DLT estimator bounds hold (est_w = max(w, tau) >= w)") {
    val df = SparkEntry.queries("x104_priority_sample")(spark, sf001)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 100)
    assert(rows.map(_._1).distinct.length == 100, "sampling WITHOUT replacement")
    // estimator: est_w >= w always; and tau is one value (est_w takes
    // at most |sample|+1 distinct values: each w above tau, else tau)
    rows.foreach { case (id, w, pri, est) =>
      assert(est >= w.toDouble, s"doc $id est_w $est < weight $w")
      assert(pri >= w.toDouble, s"doc $id priority $pri < weight $w (u <= 1)")
    }
    // weight-biased inclusion: the sampled docs' mean weight must
    // exceed the corpus mean (longer docs get proportionally higher
    // priorities; deterministic for the fixed fixture + hash)
    val corpusMean = spark.read.parquet(s"$sf001/documents.parquet")
      .agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = rows.map(_._2).sum.toDouble / rows.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean must exceed corpus mean $corpusMean")
    // deterministic: a second run yields the identical sample
    val again = SparkEntry.queries("x104_priority_sample")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(again.sameElements(rows.map(r => (r._1, r._3))))
  }

  test("x105: TextRank scores live in the damped fixed-point band and " +
      "the ranking is a descending top-20") {
    val rows = SparkEntry.queries("x105_textrank")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.length == 20)
    assert(rows.forall(_._1.nonEmpty))
    // damping 0.85 with row-stochastic transitions: after any number of
    // iterations from s0=1, scores stay within [0.15, 0.15 + 0.85*max_in],
    // and a corpus keyword must beat the uniform fixed point (score 1)
    assert(rows.forall(_._2 >= 0.15))
    assert(rows.head._2 > 1.0,
      s"top keyword score ${rows.head._2} should exceed the uniform fixed point")
    // presentation order: rounded score desc, then token asc
    val sorted = rows.sortBy { case (t, sc) => (-sc, t) }
    assert(rows.sameElements(sorted), "top-20 must be ordered (score desc, token)")
  }

  test("x105: total score mass is conserved within the damping leak " +
      "(sum over nodes stays near |V|: transition is row-stochastic)") {
    // run the full-vocabulary scores (not just top-20) for the mass check
    val full = {
      // 5 iterations of the same recurrence in plain Scala over the
      // collected edge list — an independent in-memory reference
      val docs = spark.read.parquet(s"$sf001/documents.parquet")
        .select("text").collect().map(_.getString(0))
      val pairs = docs.flatMap { t =>
        val tk = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        tk.sliding(2).collect { case Array(a, b) if a != b => (a, b) }
      }
      val und = pairs ++ pairs.map { case (a, b) => (b, a) }
      val w = und.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      val strength = w.groupBy(_._1._1).map { case (src, m) => (src, m.values.sum) }
      var score = strength.keys.map(t => (t, 1.0)).toMap
      for (_ <- 1 to 5) {
        val contrib = scala.collection.mutable.Map[String, Double]()
        // deterministic accumulation order for the reference
        w.toSeq.sortBy { case ((a, b), _) => (a, b) }.foreach { case ((src, dst), wt) =>
          contrib(dst) = contrib.getOrElse(dst, 0.0) +
            score(src) * wt.toDouble / strength(src).toDouble
        }
        score = score.keys.map(t => (t, 0.15 + 0.85 * contrib.getOrElse(t, 0.0))).toMap
      }
      score
    }
    val mass = full.values.sum
    val n = full.size
    // row-stochastic: sum_{v} s_{k+1}(v) = 0.15*|V| + 0.85*sum_v s_k(v)
    // = |V| exactly at every iteration (started from s0 = 1 per node)
    assert(math.abs(mass - n) < 1e-6 * n,
      s"score mass $mass must stay at |V|=$n under a row-stochastic walk")
    // and the Spark top-20 agrees with the reference's top-20
    val sparkTop = SparkEntry.queries("x105_textrank")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val refTop = full.toSeq
      .map { case (t, sc) => (t, math.rint(sc * 1e6) / 1e6) }
      .sortBy { case (t, sc) => (-sc, t) }.take(20)
    sparkTop.zip(refTop).foreach { case ((st, ss), (rt, rs)) =>
      assert(st == rt && math.abs(ss - rs) < 1e-6,
        s"Spark ($st,$ss) vs reference ($rt,$rs)")
    }
  }
}

package graft

/** Round-12 additions: the x134 construction-degree operating curve —
  * the graph family's third knob, built to answer x126/x132's recall
  * plateau (the walk knobs couldn't break ~25%@10; the curve shows the
  * ceiling belongs to the index degree K, not the walk). */
class Round19Spec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("x134_degree_sweep")(spark, sf001).collect()

  test("x134: one row per degree, ordered, with full answer sets") {
    assert(rows.map(_.getLong(0)).toSeq == Seq(5L, 10L, 20L))
    // 8 probes × k answers — the walk must fill every slot at any
    // degree (entries alone provide ≥ 8 visits, hops add B·2K more)
    assert(rows.forall(_.getAs[Long]("n_answers_5") == 40L))
    assert(rows.forall(_.getAs[Long]("n_answers_10") == 80L))
  }

  test("x134: recall is a valid fraction and hits match the recall algebra") {
    rows.foreach { r =>
      val r5 = r.getAs[Double]("recall_at_5")
      val r10 = r.getAs[Double]("recall_at_10")
      assert(r5 >= 0.0 && r5 <= 1.0 && r10 >= 0.0 && r10 <= 1.0)
      assert(math.abs(r5 - r.getAs[Long]("n_hits_5").toDouble /
        r.getAs[Long]("n_answers_5")) < 1e-6)
      assert(math.abs(r10 - r.getAs[Long]("n_hits_10").toDouble /
        r.getAs[Long]("n_answers_10")) < 1e-6)
    }
  }

  test("x134: the plateau is a DEGREE ceiling — K=20 materially beats K=5") {
    // the curve's reason to exist: x126/x132 sweep walk depth and width
    // against the K=5 standing index and plateau; quadrupling the
    // construction degree must buy recall the walk knobs could not.
    val byDeg = rows.map(r => r.getLong(0) -> r.getAs[Double]("recall_at_10")).toMap
    assert(byDeg(20L) > byDeg(5L),
      s"degree must move the plateau: $byDeg")
  }
}

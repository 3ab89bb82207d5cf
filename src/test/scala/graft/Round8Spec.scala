package graft

/** In-memory references + plan-shape proofs for the round-6 additions
  * x82 centroid-margin mislabel audit, x83 tokenizer fertility, x84
  * per-dimension whitening statistics, x85 vocabulary OOV rates.
  *
  * x82's reference rebuilds the per-vector distances from x14's OWN
  * output (the exact-decimal centroids), folding dims left-to-right in
  * the same IEEE order as the fused l2_f32f64 kernel — so equality is
  * exact, not tolerance-based, and the two reports are proven to
  * reconcile. x83/x84/x85 recompute from first principles on the raw
  * rows. */
class Round8Spec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("x82 margins reconcile exactly with x14 centroids; suspects flagged") {
    val cent: Map[(Int, Int), Double] =
      graft.llm.Similarity.queries("x14_label_centroids")(spark, sf001)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getDouble(2)).toMap
    val labels = cent.keys.map(_._1).toSeq.distinct.sorted
    val out = graft.llm.Similarity.queries("x82_centroid_margin")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val emb = graft.queries.Tables.t(spark, sf001, "embeddings").collect()
    assert(emb.length == out.size)
    var suspects = 0
    emb.foreach { r =>
      val id = r.getLong(0)
      val vec = r.getSeq[Float](1)
      val lbl = r.getInt(2)
      def d2(cl: Int): Double = {
        var acc = 0.0
        var d = 0
        while (d < vec.length) {
          val diff = vec(d).toDouble - cent((cl, d))
          acc += diff * diff
          d += 1
        }
        acc
      }
      val own = d2(lbl)
      val (othD, othCl) = labels.filter(_ != lbl).map(c => (d2(c), c)).min
      val o = out(id)
      assert(o.getInt(1) == lbl)
      assert(o.getInt(2) == othCl, s"nearest_other of $id")
      assert(o.getDouble(3) == round6(own), s"d_own2 of $id")
      assert(o.getDouble(4) == round6(othD), s"d_other2 of $id")
      assert(o.getDouble(5) == round6(othD - own), s"margin of $id")
      assert(o.getBoolean(6) == (othD < own), s"suspect of $id")
      if (othD < own) suspects += 1
    }
    // the synthetic labels are noisy clusters: some but not all vectors
    // must sit closer to a foreign centroid
    assert(suspects > 0 && suspects < emb.length, s"suspects = $suspects")
  }

  test("x83 fertility matches a first-principles reference; 5 langs") {
    val out = graft.llm.TextAnalysis.queries("x83_token_fertility")(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ref = docs.groupBy(_._1).map { case (lang, rows) =>
      val nb = rows.map { case (_, t) =>
        val lo = t.toLowerCase
        "[a-z]+".r.findAllIn(lo).length.toLong +
          "[0-9]+".r.findAllIn(lo).length.toLong +
          "[^a-z0-9\\s]".r.findAllIn(lo).length.toLong
      }.sum
      val nw = rows.map { case (_, t) =>
        t.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
      }.sum
      val nc = rows.map(_._2.length.toLong).sum
      lang -> (rows.length.toLong, nw, nb, nc)
    }
    assert(out.size == ref.size)
    ref.foreach { case (lang, (nd, nw, nb, nc)) =>
      val o = out(lang)
      assert(o.getLong(1) == nd && o.getLong(2) == nw &&
        o.getLong(3) == nb && o.getLong(4) == nc, s"counts of $lang")
      assert(o.getDouble(5) == round6(nb.toDouble / nw.toDouble), s"fertility of $lang")
      assert(o.getDouble(6) == round6(nc.toDouble / nw.toDouble), s"cpt of $lang")
    }
  }

  test("x84 whitening stats match an exact-decimal reference; 64 dims") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val out = graft.llm.Similarity.queries("x84_embedding_whiten")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == graft.llm.Frag.Dim)
    val vecs = graft.queries.Tables.t(spark, sf001, "embeddings")
      .selectExpr("embedding").collect().map(_.getSeq[Float](0))
    (0 until graft.llm.Frag.Dim).foreach { d =>
      var sv = JBD.ZERO
      var sq = JBD.ZERO
      vecs.foreach { v =>
        val x = v(d).toDouble
        sv = sv.add(new JBD(x).setScale(8, RM.HALF_UP))
        sq = sq.add(new JBD(x * x).setScale(12, RM.HALF_UP))
      }
      val n = vecs.length.toDouble
      val mean = sv.doubleValue / n
      val vr = sq.doubleValue / n - mean * mean
      val o = out(d.toLong)
      assert(o.getLong(1) == vecs.length)
      assert(o.getDouble(2) == round6(mean), s"mean of dim $d")
      assert(o.getDouble(3) == round6(vr), s"var of dim $d")
      assert(o.getDouble(4) == round6(math.sqrt(math.max(vr, 0.0))), s"std of dim $d")
    }
  }

  test("x85 OOV rates match a first-principles reference") {
    val out = graft.llm.TextAnalysis.queries("x85_oov_rate")(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val counts = docs.flatMap(d => toks(d._2))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(16).map(_._1).toSet
    val bySrc = docs.groupBy(_._1)
    assert(out.size == bySrc.size)
    bySrc.foreach { case (src, rows) =>
      val st = rows.flatMap(d => toks(d._2))
        .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val nt = st.values.sum
      val no = st.collect { case (t, c) if !vocab(t) => c }.sum
      val ty = st.size.toLong
      val tyo = st.keys.count(!vocab(_)).toLong
      val o = out(src)
      assert(o.getLong(1) == nt && o.getLong(2) == no, s"occ counts of $src")
      assert(o.getLong(4) == ty && o.getLong(5) == tyo, s"type counts of $src")
      assert(o.getDouble(3) == round6(no.toDouble / nt.toDouble), s"oov_rate of $src")
      assert(o.getDouble(6) == round6(tyo.toDouble / ty.toDouble), s"type_oov of $src")
      // with a 16-token vocab over a ~31-token vocabulary, both classes
      // must be non-degenerate
      assert(no > 0 && no < nt, s"degenerate OOV split for $src")
    }
  }

  test("x82/x84 plans: corpus crosses only a broadcast; no sort-merge join") {
    for (name <- Seq("x82_centroid_margin", "x84_embedding_whiten")) {
      val plan = graft.llm.Similarity.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), s"$name:\n${plan.take(2000)}")
      assert(!plan.contains("CartesianProduct"), s"$name:\n${plan.take(2000)}")
    }
    val p82 = graft.llm.Similarity.queries("x82_centroid_margin")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p82.contains("BroadcastNestedLoopJoin") ||
      p82.contains("BroadcastHashJoin"), p82.take(2000))
    // min-struct collapse is two-phase: partial before the exchange
    assert(p82.contains("partial_min"), p82.take(2000))
  }

  test("x85 plan: vocabulary ranked by the native global top-k; vocab join broadcast") {
    val plan = graft.llm.TextAnalysis.queries("x85_oov_rate")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK") || plan.contains("PartialTopK"),
      plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("x86 rendezvous: HRW invariant — only the removed worker's docs move") {
    val out = graft.llm.TextAnalysis.queries("x86_rendezvous_shards")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == (0L to 7L).toSet)
    // first-principles per-doc assignment
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(x: String): Long = java.lang.Long.parseLong(
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val ids = graft.queries.Tables.t(spark, sf001, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val asg = ids.map { id =>
      val sc = (0 to 7).map(w => h(s"$id:$w"))
      val a8 = sc.indexOf(sc.max)
      val a7 = sc.take(7).indexOf(sc.take(7).max)
      (a8, a7)
    }
    (0 to 7).foreach { w =>
      val n8 = asg.count(_._1 == w).toLong
      val n7 = asg.count(_._2 == w).toLong
      val ng = asg.count(p => p._2 == w && p._1 == 7).toLong
      val o = out(w.toLong)
      assert(o.getLong(1) == n8 && o.getLong(2) == n7 && o.getLong(3) == ng,
        s"worker $w")
      if (w < 7)
        // HRW stability: survivors keep everything they had, plus only
        // refugees from the removed worker
        assert(n7 == n8 + ng, s"HRW invariant broke at worker $w")
    }
    // the removed worker owned a nontrivial shard (hash balance sanity)
    assert(out(7L).getLong(1) > 0 && out(7L).getLong(2) == 0)
  }

  test("x86 plan: scoring is a narrow map — no shuffle before the 8-row aggregate") {
    val plan = graft.llm.TextAnalysis.queries("x86_rendezvous_shards")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      plan.take(2000))
    // exactly the aggregation exchange + the presentation sort
    assert("Exchange".r.findAllIn(plan).length <= 2, plan.take(3000))
  }

  test("x87 affinity reconciles exactly with x14 centroids") {
    val cent: Map[Int, Array[Double]] =
      graft.llm.Similarity.queries("x14_label_centroids")(spark, sf001)
        .collect().groupBy(_.getInt(0))
        .map { case (l, rs) =>
          l -> rs.sortBy(_.getLong(1)).map(_.getDouble(2))
        }
    val out = graft.llm.Similarity.queries("x87_label_affinity")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    val labels = cent.keys.toSeq.sorted
    assert(out.size == labels.size * (labels.size - 1) / 2)
    for (a <- labels; b <- labels if a < b) {
      def fold(f: Int => Double): Double = {
        var acc = 0.0
        (0 until graft.llm.Frag.Dim).foreach(d => acc += f(d))
        acc
      }
      val dab = fold(d => cent(a)(d) * cent(b)(d))
      val daa = fold(d => cent(a)(d) * cent(a)(d))
      val dbb = fold(d => cent(b)(d) * cent(b)(d))
      val dl2 = fold { d =>
        val x = cent(a)(d) - cent(b)(d); x * x
      }
      val o = out((a, b))
      assert(o.getDouble(2) == round6(dab / (math.sqrt(daa) * math.sqrt(dbb))),
        s"cosine of ($a,$b)")
      assert(o.getDouble(3) == round6(math.sqrt(dl2)), s"l2 of ($a,$b)")
    }
  }

  test("x88 split: no canonical group straddles splits; rescues are real") {
    val out = graft.llm.Dedup.queries("x88_leakage_free_split")(spark, sf001)
      .collect()
    // structural leak-freedom: one split per canonical group
    out.groupBy(_.getLong(1)).foreach { case (cid, rows) =>
      assert(rows.map(_.getString(2)).distinct.length == 1,
        s"canonical group $cid spans splits")
    }
    // reconciles with x32's canonical mapping
    val x32 = graft.llm.Dedup.queries("x32_canonical_docs")(spark, sf001)
      .select("doc_id", "canonical_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(x32(r.getLong(0)) == r.getLong(1)))
    // the rescued flag is exactly the naive/canonical disagreement, and
    // the duplicated fixture corpus must exercise it
    out.foreach(r =>
      assert(r.getBoolean(4) == (r.getString(2) != r.getString(3))))
    val rescued = out.count(_.getBoolean(4))
    assert(rescued > 0, "no leakage path closed — fixture should have dups")
    // every rescued doc is a non-representative member of its group
    out.filter(_.getBoolean(4)).foreach(r =>
      assert(r.getLong(0) != r.getLong(1), s"rep ${r.getLong(0)} rescued?"))
  }

  test("x89 PSI matches a fixed-order in-memory reference") {
    val out = graft.llm.TextAnalysis.queries("x89_source_psi")(spark, sf001)
      .collect().map(r => r.getString(0) -> r).toMap
    val docs = graft.queries.Tables.t(spark, sf001, "documents")
      .selectExpr("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._1)
    assert(out.size == bySrc.size)
    bySrc.foreach { case (src, rows) =>
      val bins = rows.map { case (_, id, nc) =>
        (id % 2, math.min(nc / 60, 9L))
      }
      val na = bins.count(_._1 == 0L).toLong
      val nb = bins.count(_._1 == 1L).toLong
      var psi = 0.0
      (0L to 9L).foreach { b =>
        val ca = bins.count(p => p._1 == 0L && p._2 == b).toLong
        val cb = bins.count(p => p._1 == 1L && p._2 == b).toLong
        val pa = (ca.toDouble + 1.0) / (na.toDouble + 10.0)
        val pb = (cb.toDouble + 1.0) / (nb.toDouble + 10.0)
        psi += (pa - pb) * math.log(pa / pb)
      }
      val o = out(src)
      assert(o.getLong(1) == na && o.getLong(2) == nb, s"halves of $src")
      assert(o.getDouble(3) == round6(psi), s"psi of $src")
    }
  }

  test("r67 quantified compare matches first principles incl. vacuous truth") {
    val out = graft.queries.Relational.queries("r67_quantified_compare")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r).toMap
    val sup = graft.queries.Tables.t(spark, sf001, "supplier")
      .selectExpr("s_nationkey", "s_acctbal").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val cust = graft.queries.Tables.t(spark, sf001, "customer")
      .selectExpr("c_custkey", "c_nationkey", "c_acctbal").collect()
    var vacuous = 0
    cust.foreach { r =>
      val (ck, nk, bal) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val bals = sup.getOrElse(nk, Seq.empty)
      val o = out(ck)
      assert(o.getBoolean(3) == bals.forall(bal > _), s"beats_all of $ck")
      assert(o.getBoolean(4) == bals.exists(bal > _), s"beats_any of $ck")
      if (bals.isEmpty) vacuous += 1
    }
    assert(out.size == cust.length)
    // the vacuous-truth edge (nation with no suppliers) must be exercised
    assert(vacuous > 0, "no supplier-less nation in the fixture")
  }
}

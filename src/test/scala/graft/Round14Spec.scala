package graft

/** Round-9 third wave: ranked retrieval metrics (x110) and the
  * simplified silhouette (x111). The specs pin the cross-query
  * identities that make the two gauges trustworthy: x110's set-level
  * numbers must agree with x62's independently computed recall (same
  * cores, different composition), full recall under an exact-cosine
  * final ordering must force perfect rank metrics, and x111's cluster
  * memberships must be exactly x51's Lloyd assignment (both read the
  * shared km2_cent frame — the silhouette grades the SAME clustering
  * the inertia report describes, not a re-run).
  */
class Round14Spec extends SparkSpec {

  private val Methods = Set("ivf", "ivfadcr", "ivfpq", "lsh", "pq")
  private val TopK = 10

  test("x110: metrics well-formed, n_rel agrees with x62's n_hit " +
      "per (method, query)") {
    val rows = SparkEntry.queries("x110_retrieval_metrics")(spark, sf001)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows.nonEmpty)
    assert(rows.keySet.map(_._1) == Methods)
    rows.foreach { case ((m, q), (nRel, mrr, ndcg)) =>
      assert(nRel >= 0 && nRel <= TopK, s"$m q$q n_rel $nRel")
      assert(mrr >= 0.0 && mrr <= 1.0, s"$m q$q mrr $mrr")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"$m q$q ndcg $ndcg")
      // any relevant item in the list implies a positive first-hit rank
      assert((nRel > 0) == (mrr > 0.0), s"$m q$q n_rel $nRel but mrr $mrr")
      assert((nRel > 0) == (ndcg > 0.0), s"$m q$q n_rel $nRel but ndcg $ndcg")
    }
    val x62 = SparkEntry.queries("x62_ann_recall")(spark, sf001)
      .select("method", "query_id", "n_hit")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.keySet == x62.keySet, "method/query grid differs from x62")
    rows.foreach { case (k, (nRel, _, _)) =>
      assert(nRel == x62(k), s"$k: x110 n_rel $nRel != x62 n_hit ${x62(k)}")
    }
  }

  test("x110: full recall + exact-cosine final ordering forces perfect " +
      "rank metrics (true members must occupy the top-k in exact order)") {
    val nExact = SparkEntry.queries("x62_ann_recall")(spark, sf001)
      .select("query_id", "n_exact").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("x110_retrieval_metrics")(spark, sf001)
      .collect()
      .filter(r => Set("ivf", "lsh", "ivfadcr").contains(r.getString(0)))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, q, nRel) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (nRel == nExact(q)) {
        // every true neighbor retrieved, and the method ranks by exact
        // cosine with the same tiebreak — the ranking IS the ideal one
        assert(r.getDouble(3) == 1.0, s"$m q$q full recall but mrr != 1")
        assert(r.getDouble(4) == 1.0, s"$m q$q full recall but ndcg != 1")
      }
    }
  }

  test("x111: memberships are exactly x51's Lloyd assignment, and the " +
      "silhouette is well-formed separation evidence") {
    val sil = SparkEntry.queries("x111_kmeans_silhouette")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val km = SparkEntry.queries("x51_kmeans")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sil.keySet == km.keySet, "cluster ids differ from x51")
    sil.foreach { case (cl, (n, s, d)) =>
      assert(n == km(cl), s"cluster $cl: n_members $n != x51 ${km(cl)}")
      assert(s >= -1.0 && s <= 1.0, s"cluster $cl silhouette $s out of range")
      assert(d >= 0.0, s"cluster $cl mean_dist $d negative")
    }
    // the synthetic corpus is built from planted vector clusters — a
    // clustering this gauge approves of must exist: overall (member-
    // weighted) silhouette strictly positive
    val overall = sil.values.map { case (n, s, _) => n * s }.sum /
      sil.values.map(_._1).sum.toDouble
    assert(overall > 0.0, s"overall silhouette $overall not positive")
  }

  test("x112: memberships match x51, purity and NMI well-formed, one " +
      "global NMI, and purity is consistent with the contingency bound") {
    val rows = SparkEntry.queries("x112_cluster_purity")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val km = SparkEntry.queries("x51_kmeans")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == km.keySet, "cluster ids differ from x51")
    rows.foreach { case (cl, n, _, purity, nmi) =>
      assert(n == km(cl), s"cluster $cl n_members $n != x51 ${km(cl)}")
      // majority covers at least an even share and at most everything
      assert(purity > 0.0 && purity <= 1.0, s"cluster $cl purity $purity")
      assert(purity >= 1.0 / n.toDouble, s"cluster $cl purity below floor")
      assert(nmi >= 0.0 && nmi <= 1.0 + 1e-9, s"nmi $nmi out of range")
    }
    assert(rows.map(_._5).distinct.length == 1, "NMI must be global")
    // totals must reconcile: clusters partition the corpus
    val nVecs = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_._2).sum == nVecs, "clusters do not partition corpus")
  }

  test("x113: sweep is monotone the right way per knob direction, " +
      "conserves the corpus, and its 256 point reconciles with x25") {
    val rows = SparkEntry.queries("x113_packing_sweep")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(256L, 512L, 1024L))
    assert(rows.map(_._3).distinct.length == 1, "n_docs must not vary with L")
    rows.foreach { case (l, seqs, docs, split, pad, sfrac) =>
      assert(split <= docs && seqs >= 1)
      assert(pad >= 0.0 && pad < 1.0, s"L=$l pad_frac $pad")
      assert(sfrac >= 0.0 && sfrac <= 1.0, s"L=$l split frac $sfrac")
    }
    rows.zip(rows.tail).foreach { case (a, b) =>
      // doubling the context can only merge sequences and heal splits
      assert(a._2 >= b._2, s"n_seqs not non-increasing: $a -> $b")
      assert(a._4 >= b._4, s"n_docs_split not non-increasing: $a -> $b")
      assert(a._6 >= b._6, s"split_tok_frac not non-increasing: $a -> $b")
    }
    // the L=256 sequence count IS x25's packing (same cumsum, same chop)
    val x25 = SparkEntry.queries("x25_sequence_packing")(spark, sf001).count()
    assert(rows.head._2 == x25, s"x113@256 ${rows.head._2} != x25 rows $x25")
  }

  test("x114: flags only train vectors, every flagged pair is truly " +
      "cosine-near its eval neighbor (exact in-memory recompute)") {
    val rows = SparkEntry.queries("x114_semantic_decontam")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def isEval(id: Long) = id % 50 == 0 && id < 4000
    val nEval = emb.keys.count(isEval)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    rows.foreach { case (train, n, eval, mc) =>
      assert(!isEval(train), s"eval vector $train flagged as train")
      assert(isEval(eval), s"nearest_eval $eval not in the eval set")
      assert(n >= 1 && n <= nEval)
      assert(mc >= 0.4, s"flagged pair below threshold: $mc")
      val exact = cos(emb(train), emb(eval))
      assert(math.abs(exact - mc) < 1e-5,
        s"train $train vs eval $eval: reported $mc, exact $exact")
    }
    // plan guard: the fixed-size eval side broadcasts into the corpus
    // band stream — the corpus never shuffles to meet the eval set
    val plan = SparkEntry.queries("x114_semantic_decontam")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval band probe must broadcast:\n$plan")
  }

  test("x115: batch routes like its source vectors (identical " +
      "embeddings), partitions conserve, and growth is bounded") {
    val rows = SparkEntry.queries("x115_incremental_ivf")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val nCorpus = emb.count()
    val nBatch = emb.filter("vec_id % 97 = 0").count()
    assert(rows.map(_._2).sum == nCorpus, "standing lists must partition")
    assert(rows.map(_._3).sum == nBatch, "every batch vector must route")
    rows.foreach { case (cell, nS, nN, g) =>
      // the batch is re-crawls of standing vectors with identical
      // embeddings — cosine routing is deterministic, so a cell can
      // never receive more new vectors than it has standing sources
      assert(nN <= nS, s"cell $cell: $nN new > $nS standing")
      assert(g >= 0.0 && g <= 1.0, s"cell $cell growth $g")
    }
  }

  test("Views.changes: all four CDC transitions classified, and the " +
      "three silent classes (born dead, unchanged, tombstone-over-" +
      "tombstone) produce no row") {
    import spark.implicits._
    def land(rows: (String, Long, Boolean, String)*) =
      rows.toSeq.toDF("id", "version", "deleted", "batch")
        .selectExpr("cast(batch as timestamp) as batch_date",
          "'T' as type", "id", "version", "0 as chunk", "'a' as author",
          "cast(batch as timestamp) as date", "deleted", "'{}' as data")
    val t1 = "2026-01-01 00:00:00"
    val t2 = "2026-01-02 00:00:00"
    val prev = graft.views.Views.latest(land(
      ("upd", 1L, false, t1), ("del", 1L, false, t1),
      ("res", 1L, true, t1), ("same", 1L, false, t1),
      ("still_dead", 1L, true, t1)))
    val cur = graft.views.Views.latest(land(
      ("upd", 2L, false, t2), ("del", 2L, true, t2),
      ("res", 2L, false, t2), ("same", 1L, false, t2),
      ("still_dead", 2L, true, t2), ("add", 1L, false, t2),
      ("born_dead", 1L, true, t2),
      ("upd", 1L, false, t1), ("del", 1L, false, t1),
      ("res", 1L, true, t1), ("same", 1L, false, t1),
      ("still_dead", 1L, true, t1)))
    val out = graft.views.Views.changes(prev, cur).collect()
      .map(r => r.getString(1) -> r.getString(4)).toMap
    assert(out == Map("add" -> "added", "upd" -> "updated",
      "del" -> "deleted", "res" -> "restored"),
      s"got ${out.toSeq.sorted}")
  }

  test("r78: the tombstone row plus exactly the live referencing docs, " +
      "victim side broadcast") {
    val df = SparkEntry.queries("r78_delete_propagation")(spark, sf001)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
    val tomb = rows.filter(_._2 == "tombstone")
    assert(tomb.toSeq == Seq(("src1", "tombstone", None)))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter("source = 'src1' and doc_id % 13 != 0")
      .select("doc_id").collect().map(_.getLong(0).toString).toSet
    val orphans = rows.filter(_._2 == "orphaned_ref")
    assert(orphans.map(_._1).toSet == docs,
      "orphaned_ref set must be exactly the live docs referencing src1")
    orphans.foreach { case (_, _, ref) => assert(ref.contains("src1")) }
    // the victim set is dimension-sized: it must broadcast, the corpus
    // must not shuffle to meet it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"victim probe must broadcast:\n$plan")
  }

  test("r77: every source resolves to the single tree root at exactly " +
      "its binary-tree depth (closed form: depth = bit length of idx)") {
    val rows = SparkEntry.queries("r77_reference_lineage")(spark, sf001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val nSrc = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length == nSrc, "one lineage row per source document")
    rows.foreach { case (id, root, depth) =>
      assert(root == "src0", s"$id resolved to $root, not the tree root")
      val idx = id.stripPrefix("src").toInt
      val want = if (idx == 0) 0 else 32 - Integer.numberOfLeadingZeros(idx)
      assert(depth == want, s"$id depth $depth != bit-length $want")
    }
  }
}

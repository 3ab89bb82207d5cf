package graft

import java.nio.file.Files

/** Regression spec for dup-proofing: on a corpus where every document
  * and embedding appears 3×, the fuzzy-dedup operators must (a) report
  * exact-dup groups, and (b) produce the SAME near-dup pair sets as on
  * the unique corpus (pairs are between representatives — never inflated
  * by the copy factor). */
class DupCorpusSpec extends SparkSpec {

  /** sf0.001 documents/embeddings, 3 shifted copies each, in a temp dir. */
  private lazy val dupDir: String = {
    val dir = Files.createTempDirectory("graft-dup").toString
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val embs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val d3 = (0 until 3).map(i =>
      docs.selectExpr(s"doc_id + ${i * 500} as doc_id", "text", "lang",
        "source", "n_chars")).reduce(_ unionByName _)
    val e3 = (0 until 3).map(i =>
      embs.selectExpr(s"vec_id + ${i * 500} as vec_id", "embedding",
        "label")).reduce(_ unionByName _)
    d3.coalesce(1).write.parquet(s"$dir/documents.parquet")
    e3.coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("x05 exact dedup reports 3-copy groups with the smallest id as representative") {
    val rows = SparkEntry.queries("x05_exact_dedup")(spark, dupDir).collect()
    assert(rows.length == 500) // one group per unique text
    assert(rows.forall(_.getAs[Long]("n_copies") == 3L))
    assert(rows.forall(_.getAs[Long]("rep_id") < 500L)) // min id = first copy
  }

  test("x07 minhash-LSH pairs are representative-level: same pairs as the unique corpus") {
    val unique = SparkEntry.queries("x07_lsh_neardup_pairs")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val duped = SparkEntry.queries("x07_lsh_neardup_pairs")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(duped == unique, "copy factor must not inflate the pair set")
    assert(duped.nonEmpty)
  }

  test("x13 cosine near-dup pairs are representative-level on duplicated embeddings") {
    val unique = SparkEntry.queries("x13_cosine_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val duped = SparkEntry.queries("x13_cosine_neardup")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(duped == unique)
    assert(duped.nonEmpty)
  }

  test("x09 simhash near-dups stay at the representative level too") {
    val unique = SparkEntry.queries("x09_simhash_neardups")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val duped = SparkEntry.queries("x09_simhash_neardups")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(duped == unique)
    assert(duped.nonEmpty)
  }

  test("x10 jaccard pairs stay at the representative level on the duped corpus") {
    val unique = SparkEntry.queries("x10_jaccard_pairs")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val duped = SparkEntry.queries("x10_jaccard_pairs")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(duped == unique)
    assert(duped.nonEmpty)
  }

  test("x24 clusters are identical on the duped corpus (rep-level graph)") {
    val unique = SparkEntry.queries("x24_dedup_clusters")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val duped = SparkEntry.queries("x24_dedup_clusters")(spark, dupDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(duped == unique)
    assert(duped.nonEmpty)
  }

  test("x70 agreement matrix is copy-invariant (all three detectors rep-level)") {
    val unique = SparkEntry.queries("x70_dedup_agreement")(spark, sf001)
      .collect()(0)
    val duped = SparkEntry.queries("x70_dedup_agreement")(spark, dupDir)
      .collect()(0)
    (0 until 8).foreach(i =>
      assert(duped.getLong(i) == unique.getLong(i), s"col $i inflated"))
  }

  test("x66 on the 3x corpus: every passage is duplicated, spans cover each doc") {
    val rows = SparkEntry.queries("x66_dup_spans")(spark, dupDir).collect()
    assert(rows.length == 1500)
    rows.foreach { r =>
      // all passages exist 3x corpus-wide -> one full-document span
      assert(r.getLong(4) == r.getLong(1), s"doc ${r.getLong(0)} not fully dup")
      assert(r.getLong(2) == 1L, s"doc ${r.getLong(0)} should be one span")
      assert(r.getLong(3) == r.getLong(1), s"doc ${r.getLong(0)} max span")
    }
  }
}

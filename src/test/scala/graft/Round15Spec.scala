package graft

import graft.ingest.LandingRecord
import graft.views.Views
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-9 fourth wave: time-travel snapshot reads (Views.asOf / r80)
  * and cluster-balanced sampling (x116). The asOf specs pin the store
  * identities that make time travel trustworthy (asOf at the newest
  * batch IS latest; folding the suffix batches into a past snapshot
  * reproduces the present — the same associativity r69 relies on);
  * the x116 specs pin the plan (the native TopKPerKey operator, not a
  * k-partition window sort) and the sample-accounting invariants.
  */
class Round15Spec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def rec(batch: String, id: String, ver: Long,
      deleted: Boolean = false) =
    LandingRecord(ts(batch), "W", id, ver, 0, "a", ts(batch), deleted, "{}")

  private def landing(rs: LandingRecord*): DataFrame = {
    import spark.implicits._
    spark.createDataset(rs).toDF()
  }

  private val store = landing(
    rec("2026-01-01 00:00:00", "d1", 1),
    rec("2026-01-02 00:00:00", "d1", 1), // replay of v1 at t2
    rec("2026-01-02 00:00:00", "d1", 2),
    rec("2026-01-01 00:00:00", "d2", 1),
    rec("2026-01-03 00:00:00", "d2", 2, deleted = true),
    rec("2026-01-03 00:00:00", "d3", 1)) // born at t3

  private def snap(df: DataFrame): Set[(String, Long, Boolean)] =
    df.select("id", "version", "deleted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet

  test("asOf at the newest batch date IS the latest view") {
    assert(snap(Views.asOf(store, lit(ts("2026-01-03 00:00:00")))) ==
      snap(Views.latest(store)))
  }

  test("asOf reconstructs each past cycle's snapshot from the full store") {
    assert(snap(Views.asOf(store, lit(ts("2026-01-01 00:00:00")))) ==
      Set(("d1", 1L, false), ("d2", 1L, false)))
    assert(snap(Views.asOf(store, lit(ts("2026-01-02 00:00:00")))) ==
      Set(("d1", 2L, false), ("d2", 1L, false)))
    // before the first batch: nothing had landed
    assert(Views.asOf(store, lit(ts("2025-12-31 00:00:00"))).count() == 0)
  }

  test("asOf(t) + incremental fold of the suffix batches == latest " +
      "(the r69 associativity, anchored at a time-travel read)") {
    val suffix = store.filter(col("batch_date") > lit(ts("2026-01-01 00:00:00")))
    assert(snap(Views.latestIncremental(
      Views.asOf(store, lit(ts("2026-01-01 00:00:00"))), suffix)) ==
      snap(Views.latest(store)))
  }

  test("r80 public query: the t1 snapshot read back from the full cdc " +
      "store (live rows at v1, t1 tombstones visible, t2-born docs absent)") {
    val rows = SparkEntry.queries("r80_time_travel")(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) == 1L)) // every doc at v1 at t1
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = docs.filter(_ % 12 != 1)
    assert(rows.map(_.getString(0).toLong).toSet == expect)
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getString(0).toLong % 12 == 4))
    }
  }

  test("x116 plan: the per-cluster budget runs on the native TopKPerKey " +
      "operator (map-side bounded heaps), not a k-partition window sort") {
    val plan = SparkEntry.queries("x116_balanced_sample")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"),
      plan.take(2000))
    assert(!plan.contains("RunningWindowFunction"), plan.take(2000))
  }

  test("history surfaces out-of-order producer dates as detectable " +
      "inverted intervals (valid_to < valid_from), never a silent clamp") {
    import spark.implicits._
    def recAt(id: String, ver: Long, date: String) =
      LandingRecord(ts("2026-01-10 00:00:00"), "W", id, ver, 0, "a",
        ts(date), false, "{}")
    // d1: v2 stamped EARLIER than v1 (out-of-order producer);
    // d2: monotone control
    val df = landing(
      recAt("d1", 1, "2026-01-05 00:00:00"),
      recAt("d1", 2, "2026-01-02 00:00:00"),
      recAt("d2", 1, "2026-01-01 00:00:00"),
      recAt("d2", 2, "2026-01-03 00:00:00"))
    val h = Views.history(df)
    val bad = h.filter(col("valid_to") < col("valid_from"))
      .select("id", "version").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(bad.toSeq == Seq(("d1", 1L)),
      "exactly the out-of-order row must be flagged, nothing clamped")
    // the monotone document's intervals chain cleanly
    val d2 = h.filter("id = 'd2'").orderBy("version")
      .select("valid_from", "valid_to", "is_current").collect()
    assert(d2(0).getTimestamp(1) == d2(1).getTimestamp(0) &&
      !d2(0).getBoolean(2) && d2(1).getBoolean(2) && d2(1).isNullAt(1))
  }

  test("asOf over a date-partitioned parquet store reaches the scan as " +
      "a partition filter (time travel prunes batches before any exchange)") {
    val dir = "/tmp/graft_asof_store"
    import spark.implicits._
    spark.createDataset(Seq(
        rec("2026-01-01 00:00:00", "d1", 1),
        rec("2026-01-02 00:00:00", "d1", 2),
        rec("2026-01-03 00:00:00", "d1", 3))).toDF()
      .write.mode("overwrite").partitionBy("batch_date").parquet(dir)
    val df = Views.asOf(spark.read.parquet(dir),
      lit(ts("2026-01-02 00:00:00")))
    // semantics: the t3 batch must be invisible
    assert(snap(df) == Set(("d1", 2L, false)))
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(scan.isDefined && scan.get.contains("batch_date"),
      s"batch_date predicate did not reach the scan as a partition filter:\n" +
        plan.take(3000))
  }

  test("x117 invariants: counts partition the corpus, auc in [0,1], " +
      "gini is 2*auc-1, and the en-probe discriminates better than chance") {
    val r = SparkEntry.queries("x117_probe_auc")(spark, sf001).collect()
    assert(r.length == 1)
    val (nPos, nNeg, auc, gini) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2), r(0).getDouble(3))
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(nPos + nNeg == nDocs)
    assert(nPos > 0 && nNeg > 0)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(gini - (2.0 * auc - 1.0)) < 2e-6)
    // 3 epochs on separable en/non-en char features must beat chance
    assert(auc > 0.5, s"trained probe AUC $auc not better than chance")
  }

  test("x116 invariants: clusters partition the corpus, the cap binds " +
      "exactly at min(cap, cluster size), and the audit agrees with x51") {
    val dir = "/root/testdata/sf0.01" // 500 vectors: the 25-cap binds
    val rows = SparkEntry.queries("x116_balanced_sample")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val nCorpus = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == nCorpus, "cluster sizes must partition the corpus")
    rows.foreach { case (cl, members, taken, rate) =>
      assert(taken == math.min(25L, members), s"cl $cl taken $taken of $members")
      assert(math.abs(rate - taken.toDouble / members) < 1e-6)
    }
    assert(rows.exists(r => r._3 == 25L), "at 500 vectors the cap must bind somewhere")
    val x51 = SparkEntry.queries("x51_kmeans")(spark, dir)
      .select("cluster_id", "n_members").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap == x51,
      "x116 must audit the SAME clustering x51 reports")
  }
}

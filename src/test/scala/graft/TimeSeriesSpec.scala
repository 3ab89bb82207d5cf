package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Boundary semantics of the time-series operators (r35/r36/r37/r41) and
  * sequence packing (x25), pinned on hand-built fixtures. The fixtures
  * are written as parquet into a temp dir shaped like the test corpus
  * (events.ts as long nanos, matching Tables.t's nanos handling), so the
  * exact production query entry points run unchanged. */
class TimeSeriesSpec extends SparkSpec {

  private def us(sec: Long): Long = sec * 1000000L
  private def nanos(sec: Long): Long = sec * 1000000000L

  /** Write an events fixture: (event_id, sec-offset, user, type, value). */
  private def eventsDir(rows: (Long, Long, Long, String, Double)*): String = {
    val dir = Files.createTempDirectory("graft_ts").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, sec, u, ty, v) =>
      Row(id, nanos(sec), u, ty, v, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq, 2), schema)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("r35 as-of: view at the exact purchase timestamp matches (inclusive)") {
    val dir = eventsDir(
      (1L, 100L, 7L, "view", 1.0),      // exactly at purchase time
      (2L, 100L, 7L, "purchase", 5.0),
      (3L, 150L, 7L, "view", 1.0),      // after -> must not match
      (4L, 200L, 8L, "purchase", 5.0))  // user with no views
    val out = SparkEntry.queries("r35_asof_join")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("gap_us")).toMap
    assert(out(2L) == 0L)   // matched the equal-ts view
    assert(out(4L) == -1L)  // no view -> sentinel
  }

  test("r36 range join: strict 10-minute window, bucket crossing included") {
    val dir = eventsDir(
      (1L, 1000L, 7L, "view", 2.0),          // 599s before -> in window
      (2L, 1599L, 7L, "purchase", 0.0),
      (3L, 999L, 7L, "click", 3.0),          // exactly 600s before -> included (>=)
      (4L, 1599L, 7L, "view", 4.0),          // same instant -> excluded (strict <)
      (5L, 100L, 7L, "view", 9.0))           // far before -> excluded
    val out = SparkEntry.queries("r36_range_join")(spark, dir).collect()
    val p = out.find(_.getAs[Long]("event_id") == 2L).get
    assert(p.getAs[Long]("n_prior") == 2L)
    assert(p.getAs[Double]("val_prior") == 5.0)
  }

  test("r37 sessionize: a gap of exactly 30 minutes stays in-session") {
    val dir = eventsDir(
      (1L, 0L, 7L, "view", 1.0),
      (2L, 1800L, 7L, "view", 1.0),    // exactly 30 min later -> same session
      (3L, 3601L, 7L, "view", 1.0))    // 30 min + 1 s -> new session
    val out = SparkEntry.queries("r37_sessionize")(spark, dir).collect()
    assert(out.length == 2)
    val s1 = out.find(_.getAs[Long]("session_id") == 1L).get
    assert(s1.getAs[Long]("n_events") == 2L)
    assert(s1.getAs[Long]("start_us") == us(0) && s1.getAs[Long]("end_us") == us(1800))
  }

  test("r41 range window: interval frame is value-based, not row-based") {
    val dir = eventsDir(
      (1L, 0L, 7L, "view", 1.0),
      (2L, 500L, 7L, "view", 2.0),
      (3L, 1050L, 7L, "view", 4.0))  // 550s after #2: #2 in frame, #1 not
    val out = SparkEntry.queries("r41_range_window")(spark, dir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_win"), r.getAs[Double]("val_win"))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)))   // 500s gap <= 600s -> includes #1
    assert(out(3L) == ((2L, 6.0)))   // includes #2 only
  }

  test("x25 packing: a doc is assigned by its start offset; lang-partitioned") {
    val dir = Files.createTempDirectory("graft_ts").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val data = Seq(
      Row(1L, txt(200), "en", "s", 0L),  // start 0   -> seq 0
      Row(2L, txt(100), "en", "s", 0L),  // start 200 -> seq 0 (spans into 1)
      Row(3L, txt(10), "en", "s", 0L),   // start 300 -> seq 1
      Row(4L, txt(300), "fr", "s", 0L))  // fr packs independently: seq 0
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x25_sequence_packing")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("seq_id")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(out(("en", 0L)) == 2L && out(("en", 1L)) == 1L)
    assert(out(("fr", 0L)) == 1L)
  }
}

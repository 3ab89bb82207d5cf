package graft

import org.apache.spark.sql.Row

class SpaceSavingSpec extends SparkSpec {

  test("topk_freq is registered and exact when capacity >= distinct count") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("x").repartition(4) // force partial buffers + merge
    val rows = df.selectExpr("topk_freq(x, 3, 10) as tops")
      .selectExpr("inline(tops)").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 5L), ("b", 3L), ("c", 3L))) // tie b/c broken by item
  }

  test("topk_freq bounds state at capacity and keeps heavy hitters under eviction") {
    import spark.implicits._
    // 1000 x "hot" + 50 distinct cold items, capacity 8 << distinct
    val data = Seq.fill(1000)("hot") ++ (1 to 50).map(i => s"cold_$i")
    val rows = data.toDF("x").repartition(4)
      .selectExpr("topk_freq(x, 1, 8) as tops")
      .selectExpr("inline(tops)").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "hot")
    assert(rows.head.getLong(1) >= 1000L) // SpaceSaving only over-estimates
  }

  test("topk_freq ignores nulls") {
    import spark.implicits._
    val rows = Seq(Some("a"), None, Some("a"), None).toDF("x")
      .selectExpr("topk_freq(x, 5, 10) as tops")
      .selectExpr("inline(tops)").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
  }
}

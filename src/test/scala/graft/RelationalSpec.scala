package graft

/** Smoke: every public query runs at sf0.001 and returns rows with the
  * advertised column names (full value check is the driver's DuckDB
  * oracle at sf0.01; see tools/verify_local.py). */
class RelationalSpec extends SparkSpec {
  /** Legitimately empty at sf0.001 (e.g. every customer has orders). */
  private val mayBeEmpty = Set("r06_customers_without_orders")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf001)
      if (!mayBeEmpty(name))
        assert(df.count() > 0, s"$name returned no rows")
      else df.count() // still must execute
      assert(df.columns.nonEmpty)
      assert(df.columns.forall(c => !c.contains("(")),
        s"$name has unaliased computed column(s): ${df.columns.mkString(",")}")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}

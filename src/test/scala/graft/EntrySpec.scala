package graft

/** Smoke: every registered query runs on sf0.001 and the driver
  * contract invariants hold (entry rows > 0, oracle keys ⊆ query keys).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs and returns a non-degenerate schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      df.count() // executes the plan; throws on analysis/runtime errors
    }
  }
}

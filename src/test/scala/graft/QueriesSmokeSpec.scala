package graft

/** Every driver-declared query runs and returns rows at sf0.001. The
  * value-level gate is scripts/check_oracle.py (DuckDB compare); this
  * keeps `sbt test` catching plan-breaking regressions.
  */
class QueriesSmokeSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      assert(fn(spark, sf("0.001")).count() > 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

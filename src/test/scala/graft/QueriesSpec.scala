package graft

/** Smoke: every registered query runs at sf0.001 and the flagship entry
  * returns rows. Value-level correctness is the driver's DuckDB gate
  * (dev/check_correctness.py mimics it locally at sf0.01).
  */
class QueriesSpec extends SparkTestBase {

  // By construction empty on the well-formed TPC-H-ish data: every partkey
  // is referenced and every order has a customer.
  private val mayBeEmpty = Set("u2_except", "j3_anti_diff")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfTiny)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}

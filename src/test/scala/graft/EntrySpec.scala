package graft

/** The driver's t1 smoke check: entry() on sf0.001 must return rows. */
class EntrySpec extends SparkSuite {
  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query has an oracle (estimator/RNG ops use tolerance bands)") {
    val noOracle = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == Set.empty[String])
  }
  test("query names are unique and ordered") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
    assert(SparkEntry.oracleSql.size == names.size)
  }
}

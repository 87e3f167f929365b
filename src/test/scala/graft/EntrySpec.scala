package graft

/** The driver's t1 smoke check: entry() on sf0.001 must return rows. */
class EntrySpec extends SparkSuite {
  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every query has either an oracle or a documented rows-only status") {
    val noOracle = SparkEntry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle ==
      Set("q17_approx_count_distinct", "q31_sample", "q90_hll_sketch"))
  }
  test("query names are unique and ordered") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
    assert(SparkEntry.oracleSql.size == names.size - 3)
  }
}

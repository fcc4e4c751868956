package graft

/** Driver-contract hygiene: the oracle map may only reference declared
  * queries (a typo'd key would silently never be hash-checked), query
  * names stay within the driver's expected charset, and the flagship
  * entry answers on the smoke fixture.
  */
class ContractSpec extends SparkSpec {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-identifier query names: $bad")
  }

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

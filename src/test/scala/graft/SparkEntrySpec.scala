package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {

  test("every oracle has a query; maps build without duplicate-key loss") {
    // uniqueMap throws on duplicates, so merely forcing both maps is the
    // duplicate check; the subset check catches oracle typos
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    assert(qs.size > 100)
  }

  test("query names follow the q_ convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.startsWith("q_"))
    assert(bad.isEmpty, s"non-conventional query names: $bad")
  }
}

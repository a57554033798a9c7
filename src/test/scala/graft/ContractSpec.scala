package graft

/** Driver-contract invariants: the correctness gate only checks queries
  * that appear in BOTH maps, so a key drifting out of `oracleSql` would
  * silently downgrade that operator to a rows-only check. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

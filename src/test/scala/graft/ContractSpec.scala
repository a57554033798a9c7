package graft

/** Driver-contract invariants: the correctness gate only checks queries
  * that appear in BOTH maps, so a key drifting out of `oracleSql` would
  * silently downgrade that operator to a rows-only check. */
class ContractSpec extends SparkSpec {

  /** The declared exceptions: deterministic operators whose kernel the
    * oracle engine cannot express (no zlib in DuckDB), accepted as
    * rows-only ON PURPOSE. Anything else missing an oracle is drift. */
  private val RowsOnly = Set("q_compress_ratio")

  test("every query has an oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- RowsOnly).isEmpty,
      s"queries without oracle: ${(q -- o -- RowsOnly).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert((RowsOnly -- q).isEmpty && (RowsOnly & o).isEmpty,
      "RowsOnly entries must exist as queries and must NOT have oracles")
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

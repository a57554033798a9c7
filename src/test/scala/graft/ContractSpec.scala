package graft

/** Driver-contract invariants: the correctness gate only checks queries
  * that appear in BOTH maps, so a key drifting out of `oracleSql` would
  * silently downgrade that operator to a rows-only check. */
class ContractSpec extends SparkSpec {

  /** The declared rows-only exceptions — EMPTY since round 9: the zlib
    * kernel is spec-only library surface and q_compress_ratio now runs
    * the oracle-able entropy-coded-size twin, so every driver-checked
    * query hash-twins. Anything appearing here again is drift. */
  private val RowsOnly = Set.empty[String]

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

  /** Round-9 gate: every query's RESULT SCHEMA stays inside the blessed
    * type set the driver's typed-value hash is known to compare cleanly
    * ({BIGINT, DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP} on the DuckDB
    * side). Anything else — an un-cast Spark INT, a decimal(38,0) sum, a
    * float — has hash-failed twice (r5 q_expectations, r8 q_bootstrap)
    * even with numerically identical values. Schema derivation is
    * analysis-only for declarative queries; the iterative/materializing
    * ones execute their driver-side steps at sf0.001, which is what
    * PlanSpec already does. tools/check.py enforces the same contract on
    * the ORACLE side (DuckDB relation types). */
  test("every query's result schema uses only driver-hashable types") {
    import org.apache.spark.sql.types._
    val d = "/root/testdata/sf0.001"
    def blessed(t: DataType): Boolean = t match {
      case LongType | DoubleType | StringType | BooleanType | DateType => true
      case _: TimestampType | TimestampNTZType => true
      case _ => false
    }
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val sch = fn(spark, d).schema
      sch.fields.filterNot(f => blessed(f.dataType))
        .map(f => s"$name.${f.name}: ${f.dataType.simpleString}")
    }
    assert(bad.isEmpty, s"non-blessed result columns:\n  ${bad.mkString("\n  ")}")
  }
}

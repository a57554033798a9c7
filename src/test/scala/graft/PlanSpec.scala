package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan invariants — the properties that make these operators
  * viable at 100 TB. Asserted so a refactor can't silently regress them:
  * filter/column pushdown must reach the parquet scan, dimension joins must
  * broadcast (never shuffle the fact side), and top-k must be a
  * TakeOrderedAndProject (per-partition heaps), not a global sort. */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.explainString(FormattedMode)

  test("filters and projection push down to the parquet scan") {
    val p = plan("q_filter_events")
    assert(p.contains("EqualTo(event_type,click)"), "filter must reach PushedFilters")
    assert(p.contains("GreaterThan(value,10.0)"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("props"), "unused columns must be pruned from the scan")
  }

  test("column pruning: projection query reads only needed columns") {
    val readSchema = plan("q_project_revenue").linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("dimension enrichment broadcasts the small side") {
    val p = plan("q_enrich_join")
    assert(p.contains("BroadcastHashJoin"), "dim join must broadcast, not shuffle the fact side")
    assert(!p.contains("SortMergeJoin"))
  }

  test("multi-way join pushes the date-range predicate into the orders scan") {
    val p = plan("q5_region_revenue")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "range filter must reach the scan")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q_topk_users").contains("TakeOrderedAndProject"))
    assert(plan("q_sim_topk").contains("TakeOrderedAndProject"))
  }
}

package graft

import org.apache.spark.sql.execution.FormattedMode

/** Pins single evaluation of expensive scan-side kernels that are
  * referenced by MULTIPLE consumer expressions: CollapseProject must not
  * inline a multi-use non-cheap expression into each use site (the
  * decontaminate double-evaluation class of regression, measured 2× at
  * sf0.1 when it happened). */
class KernelSingleEvalSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def fullPlan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("decontaminate evaluates the shingle kernel once per side") {
    // one kernel for the bench side, one for the train side — never two
    // on the same branch (size + explode must share the named array)
    val plan = fullPlan("q_decontaminate")
    val n = "word_shingles".r.findAllIn(plan).size
    assert(n <= 2, s"expected at most one shingle kernel per branch, found $n:\n$plan")
  }

  test("repeatedSpans evaluates the tokenizer once") {
    // the token array feeds both the window-count sequence and the slice;
    // a collapse regression would inline the split+filter kernel twice
    val plan = fullPlan("q_repeated_spans")
    val n = "split\\(".r.findAllIn(plan).size
    assert(n <= 1, s"expected a single tokenize kernel, found $n:\n$plan")
  }
}

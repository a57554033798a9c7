package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Hand-computed pins for the round-6 classifier-eval metrics: exact
  * rank-sum ROC-AUC and Cohen's kappa. Both are exact-integer kernels, so
  * every assertion is an equality. */
class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def scored(rows: (Int, Boolean)*) = rows.toDF("s", "y")

  test("aucExact: perfect separation is 1.0, reversed is 0.0") {
    val perfect = Curation.aucExact(
      scored((1, false), (2, false), (3, true), (4, true)), "s", "y").collect()(0)
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2)) ==
      (2L, 2L, 1000000L))
    val reversed = Curation.aucExact(
      scored((1, true), (2, true), (3, false), (4, false)), "s", "y").collect()(0)
    assert(reversed.getLong(2) == 0L)
  }

  test("aucExact: all-tied scores give exactly 0.5; mixed ties match hand AUC") {
    val tied = Curation.aucExact(
      scored((7, true), (7, false), (7, true), (7, false)), "s", "y").collect()(0)
    assert(tied.getLong(2) == 500000L)
    // scores: pos {2,3,3}, neg {1,3}; pairs: (2>1)=1 (2v3)=0 (3>1)=1 (3=3)=.5
    // (3>1)=1 (3=3)=.5 -> U = 4.0 of 6 -> 666666 floored
    val mixed = Curation.aucExact(
      scored((2, true), (3, true), (3, true), (1, false), (3, false)),
      "s", "y").collect()(0)
    assert((mixed.getLong(0), mixed.getLong(1), mixed.getLong(2)) ==
      (3L, 2L, 666666L))
  }

  test("aucExact: single-class input reports 0 instead of dividing by zero") {
    val r = Curation.aucExact(scored((1, true), (2, true)), "s", "y").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 0L, 0L))
  }

  test("cohenKappa: perfect agreement is 1.0, constant raters degenerate to 0") {
    val perfect = Curation.cohenKappa(
      Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")).toDF("r1", "r2"),
      "r1", "r2").collect()(0)
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2)) ==
      (4L, 4L, 1000000L))
    val constant = Curation.cohenKappa(
      Seq(("a", "a"), ("a", "a")).toDF("r1", "r2"), "r1", "r2").collect()(0)
    assert(constant.getLong(2) == 0L)
  }

  test("cohenKappa: the textbook 2x2 worked example") {
    // 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no: po=0.7, pe=0.5,
    // kappa = 0.4 exactly -> 400000 ppm
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = Curation.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (50L, 35L, 400000L))
  }

  test("cohenKappa: NULL ratings form their own agreeing category") {
    val df = Seq[(String, String)](
      (null, null), (null, null), ("a", "a"), ("a", null), (null, "a"))
      .toDF("r1", "r2")
    val r = Curation.cohenKappa(df, "r1", "r2").collect()(0)
    // agreement: 2 null-null + 1 a-a = 3 of 5; marginals a:(2,2) null:(3,3)
    // pe_num = 2*2 + 3*3 = 13; kappa = (5*3-13)/(25-13) = 2/12 -> 166666
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 3L, 166666L))
  }

  test("kappa of a rater against itself is 1 on the fixture corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val r = Curation.cohenKappa(docs, "lang", "lang").collect()(0)
    assert(r.getLong(2) == 1000000L)
  }
}

package graft

import graft.operators.Timeseries

/** Hand-computed fixtures for the exact-integer time-series kernels (the
  * oracles pin the real-data runs; these pin the arithmetic). */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaWeights is the truncated 1e6/2^i ladder") {
    assert(Timeseries.ewmaWeights(8) ==
      Seq(1000000L, 500000L, 250000L, 125000L, 62500L, 31250L, 15625L, 7812L))
  }

  test("ewmaSmooth: short-history rows use only the weights whose lags exist") {
    val df = Seq((1L, "k", 1L, 100L), (2L, "k", 2L, 400L), (3L, "k", 3L, 700L))
      .toDF("id", "key", "ord", "v")
    val out = Timeseries.ewmaSmooth(df, "key", Seq("ord"), "v",
      idCols = Seq("id"), lookback = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // row1: 100 (only w0); row2: (1e6·400 + 5e5·100)/1.5e6 = 300;
    // row3: (1e6·700 + 5e5·400)/1.5e6 = 600
    assert(out == Map(1L -> 100.0, 2L -> 300.0, 3L -> 600.0), s"got: $out")
  }

  test("ewmaSmooth: keys are independent and the lookback truncates") {
    val df = (1L to 10L).map(i => (i, if (i <= 5) "a" else "b", i, 1000L))
      .toDF("id", "key", "ord", "v")
    val out = Timeseries.ewmaSmooth(df, "key", Seq("ord"), "v",
      idCols = Seq("id"), lookback = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // constant series → every EWMA is exactly the constant, for both keys
    assert(out == (1L to 10L).map(_ -> 1000.0).toMap, s"got: $out")
  }

  test("olsTrend: exact line recovered exactly; negative slope truncates like the oracle") {
    val up = (0L to 4L).map(x => ("up", x, 2 * x + 3))        // y = 2x + 3
    val dn = (0L to 4L).map(x => ("dn", 10 + x, -3 * x + 50)) // slope −3
    val df = (up ++ dn).toDF("g", "x", "y")
    val out = Timeseries.olsTrend(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("up") == ((5L, 2.0, 3.0)), s"got: ${out("up")}")
    // x offset folds into the intercept: y = −3(x−10) + 50 = −3x + 80
    assert(out("dn") == ((5L, -3.0, 80.0)), s"got: ${out("dn")}")
  }

  test("olsTrend: degenerate groups emit NULL, not a crash") {
    val df = Seq(("one", 1L, 5L),                    // n = 1
      ("flat", 7L, 1L), ("flat", 7L, 9L))            // zero x-variance
      .toDF("g", "x", "y")
    val rows = Timeseries.olsTrend(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> ((r.isNullAt(2), r.isNullAt(3)))).toMap
    assert(rows == Map("one" -> ((true, true)), "flat" -> ((true, true))))
  }

  test("olsTrend micro-division truncates toward zero (matches DuckDB //)") {
    // x = 0,1,2 / y = 0,0,1 → slope = (3·2 − 3·1)/(3·5 − 9) = 0.5 exactly
    val df = Seq(("g", 0L, 0L), ("g", 1L, 0L), ("g", 2L, 1L)).toDF("g", "x", "y")
    val out = Timeseries.olsTrend(df, "g", "x", "y").collect().head
    assert(out.getDouble(2) == 0.5)
    // intercept from the truncated slope: (1e6·1 − 5e5·3) div 3 =
    // −500000 div 3 = −166666 (truncation toward zero) → −0.166666
    assert(out.getDouble(3) == -0.166666, s"got: ${out.getDouble(3)}")
  }

  test("olsTrend is partitioning-invariant (decimal sums, no float accumulation)") {
    val df = (0 until 1000).map(i => (s"g${i % 3}", (i * 17 % 101).toLong,
      (i * 29 % 211).toLong))
    def run(parts: Int) = Timeseries.olsTrend(
      df.toDF("g", "x", "y").repartition(parts), "g", "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(run(1) == run(17))
  }
}

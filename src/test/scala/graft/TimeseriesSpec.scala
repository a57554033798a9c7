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

  // ---- rolling z-score anomalies ----

  test("rollingAnomalies: a spike against a flat history trips; warm-up never does") {
    // constant 100s, then a spike; zero-variance frame → boolean still
    // exact (any deviation anomalous), z2_floor NULL
    val rows = (1L to 6L).map(i => ("k", i, 100L)) :+ (("k", 7L, 500L))
    val df = rows.toDF("k", "seq", "v")
    val out = Timeseries.rollingAnomalies(df, "k", Seq("seq"), "v",
        idCols = Seq("seq"), lookback = 8, kSigma = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    // rows 1-4: n_prior < 4 → warm-up, never anomalous
    assert((1L to 4L).forall(i => !out(i)._2), s"warm-up must not alarm: $out")
    // row 5/6: 4-5 prior constant rows, value equals history → quiet
    assert(out(5L) == ((4L, false, -1L)) && out(6L) == ((5L, false, -1L)))
    // row 7: spike vs zero-variance history → anomaly, z2_floor NULL
    assert(out(7L) == ((6L, true, -1L)), s"got: ${out(7L)}")
  }

  test("rollingAnomalies: z² quotient is the exact floored integer ratio") {
    // history 90,110,90,110 (n=4, s1=400, s2=40400): next x=150:
    // dev = 4·150−400 = 200 → dev² = 40000; var = 4·40400−160000 = 1600
    // z2 = 25 exactly ≥ 9 → anomaly; x=110 → dev=40, 1600/1600 = 1 → quiet
    val rows = Seq(("k", 1L, 90L), ("k", 2L, 110L), ("k", 3L, 90L),
      ("k", 4L, 110L), ("k", 5L, 150L))
    val out = Timeseries.rollingAnomalies(rows.toDF("k", "seq", "v"),
        "k", Seq("seq"), "v", idCols = Seq("seq"), lookback = 8, kSigma = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(5L) == ((true, 25L)), s"got: ${out(5L)}")
  }

  // ---- CUSUM ----

  /** The textbook sequential recursion, for equivalence checks. */
  private def cusumRef(xs: Seq[Long], muMicro: Long, slackMicro: Long): Seq[Long] =
    xs.scanLeft(0L) { (s, x) =>
      math.max(0L, s + (1000000L * x - muMicro - slackMicro))
    }.tail

  test("cusumAlarms equals the sequential max(0, ·) recursion") {
    val xs = Seq(5L, 1L, 9L, 9L, 9L, 2L, 1L, 1L, 8L, 9L, 9L, 9L, 9L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "seq", "v")
    val out = Timeseries.cusumAlarms(df, "k", Seq("seq"), "v",
        idCols = Seq("seq"), slack = 1L, threshold = 5L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = xs.size
    val mu = xs.sum * 1000000L / n // floored: matches the engine's div
    val ref = cusumRef(xs, mu, 1000000L)
    for (i <- xs.indices)
      assert(out(i.toLong) == ref(i) / 1e6,
        s"at $i: engine ${out(i.toLong)} vs recursion ${ref(i) / 1e6}")
  }

  test("cusumAlarms: a planted mean shift trips the alarm, noise resets to 0") {
    // 20 quiet points around 10, then 10 points at 50: the shift must
    // accumulate past threshold=100 while the quiet prefix stays silent
    val xs = Seq.fill(20)(Seq(8L, 12L)).flatten.take(20) ++ Seq.fill(10)(50L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "seq", "v")
    val out = Timeseries.cusumAlarms(df, "k", Seq("seq"), "v",
        idCols = Seq("seq"), slack = 5L, threshold = 100L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((0L until 20L).forall(i => !out(i)), "quiet prefix must not alarm")
    assert(out(29L), "sustained shift must trip the alarm")
  }

  test("cusumAlarms is partitioning-invariant") {
    val df = (0 until 500).map(i =>
      (s"k${i % 7}", i.toLong, (i * 13 % 97).toLong)).toDF("k", "seq", "v")
    def run(parts: Int) = Timeseries.cusumAlarms(
      df.repartition(parts), "k", Seq("seq"), "v",
      idCols = Seq("k", "seq"), slack = 10L, threshold = 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(run(1) == run(19))
  }

  test("autocorr: alternating series hand-computed at every lag") {
    // x = 1,-1,1,-1: S=0, num_h = n²·Σx·lead, num_0 = 16·4 = 64
    val df = Seq(1L, -1L, 1L, -1L).zipWithIndex
      .map { case (x, i) => ("k", i.toLong, x) }.toDF("k", "seq", "v")
    val out = Timeseries.autocorr(df, "k", Seq("seq"), "v", maxLag = 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // lag1: Σ=-3 → (10000·16·-3) div 64 = -7500; lag2: Σ=2 → 5000;
    // lag3: Σ=-1 → -2500
    assert(out == Map(1L -> -7500L, 2L -> 5000L, 3L -> -2500L), s"got: $out")
  }

  test("autocorr: constant series and missing lags emit NULL, keys independent") {
    val const = (0 until 6).map(i => ("const", i.toLong, 42L))
    val short = (0 until 3).map(i => ("short", i.toLong, (i * i).toLong))
    val df = (const ++ short).toDF("k", "seq", "v")
    val rows = Timeseries.autocorr(df, "k", Seq("seq"), "v", maxLag = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.isNullAt(2)).toMap
    // constant → zero variance → every lag NULL
    (1L to 4L).foreach(h => assert(rows(("const", h)), s"const lag $h"))
    // n=3: lags 1,2 have pairs, lags 3,4 have none
    assert(!rows(("short", 1L)) && !rows(("short", 2L)))
    assert(rows(("short", 3L)) && rows(("short", 4L)))
  }

  test("autocorr matches a sequential BigInt reference and is partitioning-invariant") {
    val xs = (0 until 200).map(i => ((i * 37 + 11) % 101).toLong - 50)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "seq", "v")
    def ref(h: Int): Long = {
      val n = BigInt(xs.length); val s = BigInt(xs.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val sxy = xs.dropRight(h).zip(xs.drop(h)).map { case (a, b) => BigInt(a) * b }.sum
      val aH = BigInt(xs.dropRight(h).sum); val bH = BigInt(xs.drop(h).sum)
      val num = n * n * sxy - n * s * (aH + bH) + (n - h) * s * s
      val den = n * n * sxx - n * s * s
      ((BigInt(10000) * num) / den).toLong // both positive here: / == div
    }
    def run(parts: Int) = Timeseries.autocorr(
      df.repartition(parts), "k", Seq("seq"), "v", maxLag = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val one = run(1)
    (1 to 5).foreach(h => assert(one(h.toLong) == ref(h), s"lag $h: ${one(h.toLong)} vs ${ref(h)}"))
    assert(one == run(17))
  }

  test("seasonalProfile: hand-computed hour indexes and zero-total NULL") {
    val df = Seq(
      ("a", ts(0), 100L), ("a", ts(60), 300L),     // hour 0: mean 200
      ("a", ts(3600), 400L),                        // hour 1: mean 400
      ("z", ts(0), 5L), ("z", ts(3600), -5L))       // Σ = 0 → NULL index
      .toDF("g", "t", "v")
    val out = Timeseries.seasonalProfile(df, "g", "t", "v", "hour")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // overall mean 800/3: hour0 = (10000·400·3) div (2·800) = 7500
    assert(out(("a", 0L)) == ((2L, Some(7500L))), s"got ${out(("a", 0L))}")
    assert(out(("a", 1L)) == ((1L, Some(15000L))))
    assert(out(("z", 0L))._2.isEmpty && out(("z", 1L))._2.isEmpty)
  }

  test("seasonalProfile: isodow buckets are ISO Monday-first") {
    // 2024-01-01 (epoch day 19723) was a Monday; +86400·5 lands Saturday
    val mon = ts(1704067200L); val sat = ts(1704067200L + 5 * 86400)
    val df = Seq(("g", mon, 10L), ("g", sat, 30L)).toDF("g", "t", "v")
    val out = Timeseries.seasonalProfile(df, "g", "t", "v", "isodow")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // buckets 1 (Mon) and 6 (Sat); indexes: (10000·10·2) div (1·40)=5000,
    // (10000·30·2) div 40 = 15000
    assert(out == Map(1L -> 5000L, 6L -> 15000L), s"got: $out")
  }

  test("kaplanMeier: sequential product reference, censoring leaves risk set silently, terminal d=n row") {
    import org.apache.spark.sql.functions._
    // durations: events at t=1 (2 of 5), t=3 (1 of remaining 3 after a
    // censor at t=2), terminal death at t=4
    val df = Seq((1L, true), (1L, true), (2L, false), (3L, true), (4L, true))
      .toDF("t", "e")
    val got = Timeseries.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").collect()
    // t=1: n=5, d=2 -> S=3/5; t=3: n=2 (censor at 2 removed), d=1 -> S=3/10
    // t=4: n=1, d=1 -> terminal: NULL logS, s_bp=0
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 5L, 2L), (3L, 2L, 1L), (4L, 1L, 1L)))
    def expBp(s: Double) = math.rint(s * 10000).toLong
    val term1 = math.rint(math.log(3.0 / 5.0) * 1e6).toLong
    val term3 = math.rint(math.log(1.0 / 2.0) * 1e6).toLong
    assert(got(0).getLong(3) == term1)
    assert(got(1).getLong(3) == term1 + term3)
    assert(got(0).getLong(4) == expBp(math.exp(term1 / 1e6)))
    assert(got(1).getLong(4) == expBp(math.exp((term1 + term3) / 1e6)))
    assert(got(2).isNullAt(3) && got(2).getLong(4) == 0L,
      "all-die terminal row: NULL log-survival, s_bp 0")
    // the censored subject never surfaces as an event row (no t=2 output)
    // but DOES shrink the t=3 risk set from 3 to 2 — treating the censor
    // as an event instead would put a d row at t=2
    assert(!got.exists(_.getLong(0) == 2L), "censor-only durations emit no row")
    val censAsEvent = Timeseries.kaplanMeier(
      df.withColumn("e", lit(true)), col("t"), col("e"))
      .orderBy("t").collect()
    assert(censAsEvent.exists(r => r.getLong(0) == 2L && r.getLong(2) == 1L))
    // partitioning invariance
    val rep = Timeseries.kaplanMeier(df.repartition(5), col("t"), col("e"))
      .orderBy("t").collect().map(_.toSeq).toSeq
    assert(rep == got.map(_.toSeq).toSeq)
  }

  test("changepointMean: the exact-gain argmax lands on the level shift") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 10L), (5L, 10L))
      .toDF("t", "y")
    val r = Timeseries.changepointMean(df, col("t"), col("y")).collect()(0)
    // G(i=3) = 5·2·9 + 5·3·400 − 3·2·529 = 2916 → gain 2916/30 = 97.2
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L && r.getLong(2) == 2L,
      r.toString)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 10.0, r.toString)
    assert(r.getDouble(5) == 97.2, r.toString)
  }

  test("changepointMean: the argmax divides by the per-split denominator " +
      "t(n-t), not just the scaled numerator") {
    import org.apache.spark.sql.functions.col
    // D² alone peaks at t=5 (D²=900, gain 900/250=3.6) but the true gain
    // D²/(n·t·(n−t)) peaks at t=2 (900/160=5.625) — the biased argmax
    // used to return the mid-panel split here.
    val ys = Seq(2L, 1L, 0L, 0L, 0L, -3L, 0L, 0L, 0L, 0L)
    val df = ys.zipWithIndex.map { case (y, i) => (i + 1L, y) }.toDF("t", "y")
    val r = Timeseries.changepointMean(df, col("t"), col("y")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 8L,
      r.toString)
    assert(r.getDouble(3) == 1.5, r.toString)
    // mean_right = (1000000 * -3) div 8 / 1e6 (trunc toward zero)
    assert(r.getDouble(4) == -0.375, r.toString)
    assert(r.getDouble(5) == 5.625, r.toString)
  }

  test("changepointMean: a constant series ties every split to gain 0 " +
      "and breaks to the earliest") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 4L).map((_, 7L)).toDF("t", "y")
    val r = Timeseries.changepointMean(df, col("t"), col("y")).collect()(0)
    assert(r.getLong(0) == 1L && r.getDouble(5) == 0.0, r.toString)
  }
}

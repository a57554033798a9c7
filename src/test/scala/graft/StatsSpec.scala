package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the rank-correlation / hypothesis-test
  * kernels — every expected value was recomputed with exact rational
  * arithmetic (Fraction), and the micro-truncated engine formulas agree
  * with the exact values at the rounded precision on these fixtures. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanRho: exact 0.8 on the classic tie-free permutation") {
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 5L), (5L, 4L))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r = Stats.spearmanRho(df, "g", col("x"), col("y")).collect()
    assert(r.length == 1 && r(0).getLong(1) == 5L)
    // 1 − 6·Σd²/(n(n²−1)) = 1 − 24/120
    assert(r(0).getDouble(2) == 0.8, r(0).toString)
  }

  test("spearmanRho: tie-corrected via midranks (Pearson-on-midranks)") {
    val df = Seq((1L, 10L), (2L, 30L), (2L, 20L), (3L, 50L), (3L, 40L),
      (3L, 60L)).toDF("x", "y").withColumn("g", lit("a"))
    val r = Stats.spearmanRho(df, "g", col("x"), col("y")).collect()(0)
    assert(r.getDouble(2) == 0.9258, r.toString)
  }

  test("spearmanRho: per-group, perfect inverse is -1, constant is NULL") {
    val up = (1L to 4L).map(i => ("inv", i, 10L - i)) ++
      (1L to 4L).map(i => ("const", i, 7L))
    val r = Stats.spearmanRho(up.toDF("g", "x", "y"), "g",
        col("x"), col("y"))
      .collect().map(x => x.getString(0) ->
        (if (x.isNullAt(2)) null else x.getDouble(2))).toMap
    assert(r("inv") == -1.0 && r("const") == null, r.toString)
  }

  test("kendallTauB: tie-corrected tau-b with exact pair counts") {
    val df = Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 2L, 2L), (4L, 3L, 4L))
      .toDF("id", "x", "y")
    val r = Stats.kendallTauB(df, "id", col("x"), col("y")).collect()(0)
    // 6 pairs: C=5, D=0, 1 x-tie → 5/sqrt(5·6)
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.9129, r.toString)
  }

  test("kendallTauB: all-tied x yields NULL tau (degenerate denominator)") {
    val df = Seq((1L, 5L, 1L), (2L, 5L, 2L), (3L, 5L, 3L))
      .toDF("id", "x", "y")
    val r = Stats.kendallTauB(df, "id", col("x"), col("y")).collect()(0)
    assert(r.isNullAt(3), r.toString)
  }

  test("kruskalWallisH matches the exact rational H on a tied fixture") {
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _)) ++
      Seq(5L, 6L, 7L).map(("c", _))).toDF("g", "v")
    val r = Stats.kruskalWallisH(df, col("v"), "g").collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    // exact (n−1)·Σng(r̄g−r̄)²/Σ(ri−r̄)² = 6.0565 (Fraction-checked)
    assert(r.getDouble(2) == 6.0565, r.toString)
  }

  test("kruskalWallisH: identical distributions give H near 0") {
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("b", _))).toDF("g", "v")
    val r = Stats.kruskalWallisH(df, col("v"), "g").collect()(0)
    assert(math.abs(r.getDouble(2)) < 1e-9, r.toString)
  }

  test("anovaF matches the exact rational F and eta-squared") {
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _)) ++
      Seq(5L, 6L, 7L).map(("c", _))).toDF("g", "v")
    val r = Stats.anovaF(df, col("v"), "g").collect()(0)
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L)
    // SSB=19.5/2, SSW=6/6 → F=13, η²=19.5/24 (Fraction-checked)
    assert(r.getDouble(2) == 13.0 && r.getDouble(3) == 0.8125, r.toString)
  }

  test("spearmanSketch: EXACT when the group fits the sample (ties " +
      "included), close to the exact kernel when it does not") {
    // 24 rows with planted x-ties, k = 32 ≥ group → sample = group and
    // the sample-midrank formula equals the value-domain midrank
    val rows = (1 to 24).map(i =>
      ("g", i.toLong, (i / 2).toLong, (i * i).toLong))
    val df = rows.toDF("g", "id", "x", "y")
    val exact = graft.operators.Stats
      .spearmanRho(df, "g", col("x"), col("y")).collect()(0)
    val sk = graft.operators.Stats
      .spearmanSketch(df, "g", "id", col("x"), col("y"), k = 32)
      .collect()(0)
    assert(sk.getLong(1) == exact.getLong(1))
    assert(sk.getDouble(2) == exact.getDouble(2),
      s"sketch ${sk.getDouble(2)} vs exact ${exact.getDouble(2)}")
    // 2000 noisy-monotone rows, k = 64 — DKW puts ranks within ~±15%
    // at 95%; rho should land well inside ±0.1 of the exact value
    val big = (1 to 2000).map { i =>
      ("g", i.toLong, i.toLong, (i + (i * 7919 % 400)).toLong)
    }.toDF("g", "id", "x", "y")
    val exactBig = graft.operators.Stats
      .spearmanRho(big, "g", col("x"), col("y")).collect()(0).getDouble(2)
    val skBig = graft.operators.Stats
      .spearmanSketch(big, "g", "id", col("x"), col("y"), k = 64)
      .collect()(0).getDouble(2)
    assert(math.abs(skBig - exactBig) < 0.1,
      s"sketch $skBig too far from exact $exactBig")
  }

  test("spearmanSketch: the driver-collect budget guard fires with the " +
      "grain named (explicit budget pins the failure path)") {
    // 40 groups × k = 32 = 1280 model rows against a 1000-row budget —
    // the near-unique-groupCol failure mode, made deterministic by the
    // budgetRows override (the default derives from the driver heap).
    val df = (1 to 40).map(i => (s"g$i", i.toLong, i.toLong, (i * i).toLong))
      .toDF("g", "id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Stats.spearmanSketch(df, "g", "id", col("x"), col("y"),
        k = 32, budgetRows = 1000L)
    }
    assert(e.getMessage.contains("40 groups") &&
      e.getMessage.contains("budget (1000)"), e.getMessage)
  }

  test("brierDecomposition: exact bp fixture matches Murphy's components") {
    val df = Seq((1000L, false), (3000L, false), (3500L, true),
      (7000L, true), (9000L, true), (9200L, false)).toDF("p", "y")
    val r = graft.operators.Stats
      .brierDecomposition(df, col("p"), col("y"), bins = 10).collect()(0)
    assert(r.getLong(0) == 6L)
    // Fraction-checked; brier equals the exact Σ(p−o)²/n at 6dp
    assert(r.getDouble(1) == 0.244817, s"brier ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.082908, s"rel ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.083333, s"res ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.25, s"unc ${r.getDouble(4)}")
  }

  test("brierDecomposition: NULL labels are excluded, not counted as " +
      "negatives") {
    // same fixture as above plus two NULL-label rows whose scores would
    // shift every component if they were treated as o=0
    val df = Seq((1000L, Some(false)), (3000L, Some(false)),
      (3500L, Some(true)), (7000L, Some(true)), (9000L, Some(true)),
      (9200L, Some(false)), (9900L, None), (100L, None)).toDF("p", "y")
    val r = graft.operators.Stats
      .brierDecomposition(df, col("p"), col("y"), bins = 10).collect()(0)
    assert(r.getLong(0) == 6L, r.toString)
    assert(r.getDouble(1) == 0.244817, s"brier ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.082908, s"rel ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.083333, s"res ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.25, s"unc ${r.getDouble(4)}")
  }

  test("brierDecomposition: a perfectly calibrated constant score has " +
      "zero reliability and zero resolution") {
    val df = Seq((5000L, true), (5000L, false), (5000L, true),
      (5000L, false)).toDF("p", "y")
    val r = graft.operators.Stats
      .brierDecomposition(df, col("p"), col("y"), bins = 10).collect()(0)
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, r.toString)
    assert(r.getDouble(1) == 0.25 && r.getDouble(4) == 0.25, r.toString)
  }

  test("logRank: hand-computed O/E/V/z on the two-cohort fixture") {
    val df = Seq((1L, true, true), (2L, true, true), (3L, false, true),
      (1L, true, false), (4L, true, false), (5L, false, false))
      .toDF("t", "e", "g")
    val r = graft.operators.Stats
      .logRank(df, col("t"), col("e"), col("g")).collect()(0)
    assert(r.getLong(0) == 2L, r.toString)
    assert(r.getDouble(1) == 1.5 && r.getDouble(2) == 0.65, r.toString)
    assert(r.getDouble(3) == 0.6202, r.toString)
  }

  test("logRank: identical cohorts give z at 0") {
    val one = Seq((1L, true), (2L, true), (3L, false), (4L, true))
    val df = (one.map { case (t, e) => (t, e, true) } ++
      one.map { case (t, e) => (t, e, false) }).toDF("t", "e", "g")
    val r = graft.operators.Stats
      .logRank(df, col("t"), col("e"), col("g")).collect()(0)
    assert(math.abs(r.getDouble(3)) < 1e-9, r.toString)
  }

  test("mutualInfo: identical columns give NMI exactly 1, independent " +
      "columns give MI 0") {
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val r1 = graft.operators.Stats.mutualInfo(dep, col("a"), col("b"))
      .collect()(0)
    // MI = H(a) = ln 2; the floored-nano lanes are equal term-by-term
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 0.693147 && r1.getDouble(3) == 1.0, r1.toString)
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r2 = graft.operators.Stats.mutualInfo(ind, col("a"), col("b"))
      .collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0, r2.toString)
  }

  test("diffInDiff: hand 2x2 fixture") {
    val rows =
      Seq((10L, false, false), (20L, false, false),   // ctrl pre  m=15
          (20L, false, true), (30L, false, true),     // ctrl post m=25
          (10L, true, false), (30L, true, false),     // treat pre m=20
          (40L, true, true), (60L, true, true))       // treat post m=50
    val r = graft.operators.Stats.diffInDiff(rows.toDF("y", "t", "p"),
      col("y"), col("t"), col("p")).collect()(0)
    assert(r.getLong(0) == 8L)
    assert(r.getDouble(1) == 20.0 && r.getDouble(2) == 50.0, r.toString)
    assert(r.getDouble(3) == 15.0 && r.getDouble(4) == 25.0, r.toString)
    // (50−20) − (25−15)
    assert(r.getDouble(5) == 20.0, r.toString)
  }

  test("anovaF: zero within-group variance yields NULL F") {
    val df = (Seq(2L, 2L).map(("a", _)) ++ Seq(5L, 5L).map(("b", _)))
      .toDF("g", "v")
    val r = Stats.anovaF(df, col("v"), "g").collect()(0)
    assert(r.isNullAt(2), r.toString)
  }

  test("cramersV: perfect association is 1, independence is 0") {
    val dep = Seq(("x", "x"), ("x", "x"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val r1 = graft.operators.Stats.cramersV(dep, "a", "b").collect()(0)
    assert(r1.getLong(0) == 4L && r1.getLong(1) == 1L)
    assert(r1.getDouble(2) == 4.0 && r1.getDouble(3) == 1.0, r1.toString)
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r2 = graft.operators.Stats.cramersV(ind, "a", "b").collect()(0)
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0, r2.toString)
  }

  test("theilSen: exact on a clean line, robust to one outlier") {
    val line = Seq((0L, 1L), (1L, 4L), (2L, 7L), (3L, 10L), (4L, 13L))
      .toDF("x", "y")
    val r1 = graft.operators.Stats.theilSen(line, col("x"), col("y"))
      .collect()(0)
    assert(r1.getLong(0) == 5L && r1.getLong(1) == 10L)
    assert(r1.getDouble(2) == 3.0 && r1.getDouble(3) == 1.0, r1.toString)
    // y = 3x+1 with a blown final point: the slope median barely moves
    val out = Seq((0L, 1L), (1L, 4L), (2L, 7L), (3L, 10L), (4L, 1000L))
      .toDF("x", "y")
    val r2 = graft.operators.Stats.theilSen(out, col("x"), col("y"))
      .collect()(0)
    assert(r2.getDouble(2) == 3.0, r2.toString)
  }

  test("theilSen: even slope count averages the two middles") {
    val pts = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 100L)).toDF("x", "y")
    val r = graft.operators.Stats.theilSen(pts, col("x"), col("y"))
      .collect()(0)
    // slopes sorted: [2,2,2,100/3,50,96] -> (2 + 33.333...)/2
    assert(r.getLong(1) == 6L && r.getDouble(2) == 17.666667, r.toString)
    assert(r.getDouble(3) == -23.5, r.toString)
  }

  test("twoProportionsZ: pooled z on a hand fixture; degenerate NULL") {
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(40)((false, true)) ++
      Seq.fill(5)((true, false)) ++ Seq.fill(45)((false, false))
    val r = graft.operators.Stats
      .twoProportionsZ(rows.toDF("s", "g"), col("s"), col("g")).collect()(0)
    assert(r.getLong(0) == 50L && r.getLong(1) == 10L &&
      r.getLong(2) == 50L && r.getLong(3) == 5L, r.toString)
    assert(r.getDouble(4) == 0.2 && r.getDouble(5) == 0.1, r.toString)
    assert(r.getDouble(6) == 1.4003, r.toString)
    val allFail = Seq((false, true), (false, false)).toDF("s", "g")
    val r2 = graft.operators.Stats
      .twoProportionsZ(allFail, col("s"), col("g")).collect()(0)
    assert(r2.isNullAt(6), r2.toString)
  }

  test("runsTest: alternating and monotone series are mirror extremes") {
    val alt = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 1L),
      (6L, 2L)).toDF("t", "y")
    val r1 = graft.operators.Stats.runsTest(alt, col("t"), col("y"))
      .collect()(0)
    // median2 = 3; signs alternate: 6 runs of 3+3 → z = +1.8257
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L &&
      r1.getLong(2) == 6L, r1.toString)
    assert(r1.getDouble(3) == 1.8257, r1.toString)
    val mono = (1L to 6L).map(i => (i, i)).toDF("t", "y")
    val r2 = graft.operators.Stats.runsTest(mono, col("t"), col("y"))
      .collect()(0)
    assert(r2.getLong(2) == 2L && r2.getDouble(3) == -1.8257, r2.toString)
  }

  test("runsTest: exact median ties drop; one-sided series yields NULL") {
    val withTie = Seq((1L, 1L), (2L, 5L), (3L, 9L)).toDF("t", "y")
    val r = graft.operators.Stats.runsTest(withTie, col("t"), col("y"))
      .collect()(0)
    // median 5 drops; remaining signs 0,1 → 2 runs of 1+1 → the
    // zero-variance edge (2n₊n₋ = n): z must be NULL, not a 0/0
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 2L,
      r.toString)
    assert(r.isNullAt(3), r.toString)
    val oneSided = Seq((1L, 9L), (2L, 9L), (3L, 1L)).toDF("t", "y")
    val r2 = graft.operators.Stats.runsTest(oneSided, col("t"), col("y"))
      .collect()(0)
    assert(r2.isNullAt(3), r2.toString)
  }

  test("cohensD: hand fixture group-vs-rest; undersized groups NULL") {
    val df = (Seq(2L, 4L).map(("a", _)) ++ Seq(1L, 1L, 1L).map(("b", _)))
      .toDF("g", "v")
    val r = graft.operators.Stats.cohensD(df, col("v"), "g")
      .orderBy("g").collect()
    val a = r(0)
    // a=[2,4] vs rest=[1,1,1]: v1=2, v2=0, sp2=2/3 → d=2.4495, g=1.7814
    assert(a.getString(0) == "a" && a.getLong(1) == 2L)
    assert(a.getDouble(2) == 3.0 && a.getDouble(3) == 1.0, a.toString)
    assert(a.getDouble(4) == 2.4495 && a.getDouble(5) == 1.7814, a.toString)
    val single = (Seq(5L).map(("one", _)) ++ Seq(1L, 2L, 3L).map(("b", _)))
      .toDF("g", "v")
    val r2 = graft.operators.Stats.cohensD(single, col("v"), "g")
      .orderBy("g").collect().map(x => x.getString(0) -> x.isNullAt(4)).toMap
    assert(r2("one"), r2.toString)   // n_in = 1 → NULL d
  }

  test("NULL rows are excluded from the rank/test kernels, not half-counted") {
    // spearman: a NULL-x row must not shift the other rows' y midranks
    val sp = Seq((Some(1L), Some(1L)), (Some(2L), Some(10L)),
      (Some(3L), Some(11L)), (None, Some(5L)))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r1 = Stats.spearmanRho(sp, "g", col("x"), col("y")).collect()(0)
    assert(r1.getLong(1) == 3L && r1.getDouble(2) == 1.0, r1.toString)
    // kendall: NULL pairs must not inflate n_pairs
    val kd = Seq((1L, Some(1L), 1L), (2L, Some(2L), 2L), (3L, None, 3L))
      .toDF("id", "x", "y")
    val r2 = Stats.kendallTauB(kd, "id", col("x"), col("y")).collect()(0)
    assert(r2.getLong(0) == 1L && r2.getDouble(3) == 1.0, r2.toString)
    // kruskal: a NULL value must not join the value domain
    val kw0 = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(2L, 3L, 4L).map(("b", _))
      ++ Seq(5L, 6L, 7L).map(("c", _)))
      .map { case (g, v) => (g, Some(v)) }
    val kw = (kw0 :+ ("a", Option.empty[Long])).toDF("g", "v")
    val r3 = Stats.kruskalWallisH(kw, col("v"), "g").collect()(0)
    assert(r3.getLong(0) == 9L && r3.getDouble(2) == 6.0565, r3.toString)
    // anova: NULL values must not count into n
    val an = (kw0 :+ ("a", Option.empty[Long])).toDF("g", "v")
    val r4 = Stats.anovaF(an, col("v"), "g").collect()(0)
    assert(r4.getLong(0) == 9L && r4.getDouble(2) == 13.0, r4.toString)
  }

  test("twoProportionsZ: an empty group gives NULL rate, not NaN") {
    val df = Seq((true, true), (false, true)).toDF("s", "g")
    val r = graft.operators.Stats
      .twoProportionsZ(df, col("s"), col("g")).collect()(0)
    assert(r.getLong(2) == 0L && r.isNullAt(5) && r.isNullAt(6), r.toString)
  }

  test("spearmanRho: pair-domain form ≡ brute-force midrank Pearson (random, ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small value domains force heavy ties AND duplicate (x, y) cells —
    // the __cnt > 1 path of the r14 pair-domain rewrite
    val rows = (0 until 3000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      (g, (rnd.nextInt(12) - 4).toLong, (rnd.nextInt(9) - 3).toLong)
    }
    val got = Stats.spearmanRho(rows.toDF("g", "x", "y").repartition(5),
        "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // brute force: midranks per column, Pearson over them, exact BigInt sums
    rows.groupBy(_._1).foreach { case (g, rs) =>
      def midranks(vs: Seq[Long]): Map[Long, Double] = {
        val sorted = vs.sorted
        vs.distinct.map { v =>
          val below = sorted.count(_ < v); val t = sorted.count(_ == v)
          v -> (below + (t + 1) / 2.0)
        }.toMap
      }
      val rx = midranks(rs.map(_._2)); val ry = midranks(rs.map(_._3))
      val xs = rs.map(r => rx(r._2)); val ys = rs.map(r => ry(r._3))
      val n = rs.size.toDouble
      val num = xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum / n
      val den = math.sqrt((xs.map(a => a * a).sum - xs.sum * xs.sum / n) *
        (ys.map(b => b * b).sum - ys.sum * ys.sum / n))
      val expected = BigDecimal(num / den)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gotN, gotRho) = got(g)
      assert(gotN == rs.size, s"$g n")
      assert(math.abs(gotRho - expected) <= 1e-4, s"$g rho $gotRho vs $expected")
    }
  }
}

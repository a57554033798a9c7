package graft

import graft.operators.{Preferences, RelationalOps, TextAnalysis, Timeseries, Warehouse}
import org.apache.spark.sql.functions._

/** Warehouse (zone maps, mergeable agg state), preference analytics
  * (comparisons, Bradley–Terry) and the round-8 text/attribution ops —
  * golden small cases plus the algebraic invariants that justify the
  * 100 TB story (merge == recompute, no-self-join pairing). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- zone maps

  test("zoneMap: per-bucket min/max/nulls; zoneSkip prunes exactly the provably-dead buckets") {
    val df = Seq(
      (0L, Some(10.0)), (1L, Some(20.0)),        // bucket 0: [10,20]
      (2L, Some(95.0)), (3L, Some(99.0)),        // bucket 1: [95,99]
      (4L, None), (5L, None),                    // bucket 2: all null
      (6L, Some(40.0)), (7L, Some(80.0))         // bucket 3: [40,80] overlaps
    ).toDF("id", "v")
    val zones = Warehouse.zoneMap(df, expr("id div 2"), Seq("v"))
    val skip = Warehouse.zoneSkip(zones, "v", lit(30.0), lit(50.0))
      .orderBy("bucket")
      .select("bucket", "n_rows", "nnull_v", "can_skip")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(skip == Seq(
      (0L, 2L, 0L, true),   // max 20 < 30
      (1L, 2L, 0L, true),   // min 95 > 50
      (2L, 2L, 2L, true),   // all-null column
      (3L, 2L, 0L, false))) // [40,80] straddles the range
    // conservative: no bucket containing a matching row is skipped
    val matching = df.filter($"v".between(30.0, 50.0))
      .select(expr("id div 2")).as[Long].collect().toSet
    val skipped = skip.filter(_._4).map(_._1).toSet
    assert(matching.intersect(skipped).isEmpty)
  }

  test("mergeZoneMaps: per-load maps compose to the full-table map") {
    val df = (1 to 40).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
    val full = Warehouse.zoneMap(df, expr("id div 10"), Seq("v"))
    val merged = Warehouse.mergeZoneMaps(
      Seq(Warehouse.zoneMap(df.filter($"id" % 2 === 0), expr("id div 10"), Seq("v")),
        Warehouse.zoneMap(df.filter($"id" % 2 =!= 0), expr("id div 10"), Seq("v"))),
      Seq("v"))
    assert(merged.orderBy("bucket").collect().toSeq ==
      full.orderBy("bucket").collect().toSeq)
  }

  // -------------------------------------------- mergeable aggregate state

  test("aggState: merge of disjoint loads == recompute from scratch, any split, any merge order") {
    val ev = (1 to 200).map(i =>
      (s"t${i % 3}", i % 7, i * 0.37 - 20.0)).toDF("typ", "k", "v")
    val full = Warehouse.finalizeAggState(
      Warehouse.aggState(ev, Seq("typ", "k"), "v"))
    // three-way split, merged pairwise in a different order
    val parts = Seq(0, 1, 2).map(r =>
      Warehouse.aggState(ev.filter(pmod($"k" + $"v".cast("int"), lit(3)) === r),
        Seq("typ", "k"), "v"))
    val merged = Warehouse.finalizeAggState(
      Warehouse.mergeAggStates(
        Seq(Warehouse.mergeAggStates(Seq(parts(2), parts(0)), Seq("typ", "k")),
          parts(1)), Seq("typ", "k")))
    assert(merged.orderBy("typ", "k").collect().toSeq ==
      full.orderBy("typ", "k").collect().toSeq)
  }

  test("finalizeAggState: exact integer-cents aggregates") {
    val st = Warehouse.aggState(Seq(("a", 1.005), ("a", 2.0), ("a", -0.5))
      .toDF("k", "v"), Seq("k"), "v")
    val r = Warehouse.finalizeAggState(st)
      .select("k", "n", "sum_value", "min_value", "max_value", "avg_value")
      .as[(String, Long, Double, Double, Double, Double)].collect().head
    // 1.005 is 1.004999… as a double, so cents() rounds it to 100 — the
    // identical-in-both-engines behavior the oracle convention relies on
    assert(r == (("a", 3L, 2.5, -0.5, 2.0, 0.8333)))
  }

  test("compactionPlan: cum-sum binning packs small files; a file joins the group its start falls in") {
    // sizes 10,10,10,10,25,5 with target 20:
    // starts 0,10,20,30,40,65 -> groups 0,0,1,1,2,3
    val zones = Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 25L), (5L, 5L)).toDF("bucket", "n_rows")
    val r = Warehouse.compactionPlan(zones, targetRows = 20L)
      .orderBy("merge_group").as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 2L, 20L), (1L, 2L, 20L), (2L, 1L, 25L),
      (3L, 1L, 5L)), s"got $r")
  }

  // ---------------------------------------------------- optimizer stats

  test("joinCardinalityEstimate: pct=100 is exact (err_bp 0); estimate scales the key sample") {
    val a = (1 to 60).map(i => (i % 6).toLong).toDF("k")   // 10 rows per key 0..5
    val b = (1 to 12).map(i => (i % 6).toLong).toDF("k")   // 2 rows per key
    val exact = Warehouse.joinCardinalityEstimate(a, b, "k", pct = 100)
      .as[(Long, Long, Long)].collect().head
    assert(exact == ((120L, 120L, 0L)), s"got $exact")     // 6 keys x 10 x 2
    val sampled = Warehouse.joinCardinalityEstimate(a, b, "k", pct = 50)
      .as[(Long, Long, Long)].collect().head
    // whatever keys the hash kept, actual stays exact and est = kept*20*2
    assert(sampled._2 == 120L && sampled._1 % 40L == 0L, s"got $sampled")
  }

  test("equiDepthHistogram: full-sample buckets are equal-depth; catch-all clamps; partition-invariant") {
    val df = (1 to 64).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val h = RelationalOps.equiDepthHistogram(df, "v", col("id"),
        nBuckets = 4, samplePct = 100)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(h == Seq((1L, 16L), (2L, 16L), (3L, 16L), (4L, 16L)), s"got $h")
    // boundaries from a 25% sample still cover every row (catch-all) and
    // the assignment is partition-count invariant
    val h1 = RelationalOps.equiDepthHistogram(df.repartition(1), "v",
      col("id"), 4, 25).orderBy("bucket").as[(Long, Long)].collect().toSeq
    val h7 = RelationalOps.equiDepthHistogram(df.repartition(7), "v",
      col("id"), 4, 25).orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(h1 == h7, s"partitioning changed the histogram:\n$h1\nvs\n$h7")
    assert(h1.map(_._2).sum == 64L, "every row lands in exactly one bucket")
    // non-double value columns (long here) must work — the boundary read
    // is driver-side doubles, so the sample casts; previously this threw
    // ClassCastException
    val longDf = (1 to 64).map(i => (i.toLong, i.toLong * 10)).toDF("id", "v")
    val hl = RelationalOps.equiDepthHistogram(longDf, "v", col("id"),
        nBuckets = 4, samplePct = 100)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(hl == Seq((1L, 16L), (2L, 16L), (3L, 16L), (4L, 16L)), s"got $hl")
  }

  // -------------------------------------------------- preference analytics

  test("comparisons: incomplete and same-item pairs drop; ties break to the smaller item") {
    val ev = Seq(
      (0L, "b", 5.0), (1L, "a", 3.0),  // pair 0: b wins on score
      (2L, "a", 2.0), (3L, "b", 2.0),  // pair 1: tie -> a (lexicographic)
      (4L, "a", 9.0), (5L, "a", 1.0),  // pair 2: same item -> dropped
      (6L, "c", 4.0)                   // pair 3: incomplete -> dropped
    ).toDF("id", "item", "score")
    val cmp = Preferences.comparisons(ev, expr("id div 2"), "item", "score", "id")
      .orderBy("winner").as[(String, String)].collect().toSeq
    assert(cmp == Seq(("a", "b"), ("b", "a")))
  }

  test("bradleyTerry: dominance orders strengths; symmetry equalizes them; zero-win items pin to 0") {
    // a beats b 9:1, b beats c 9:1, d never wins
    val wins = Seq(("a", "b", 9L), ("b", "a", 1L), ("b", "c", 9L),
      ("c", "b", 1L), ("a", "d", 5L)).toDF("winner", "loser", "n_wins")
    val s = Preferences.bradleyTerry(wins, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(s("a") > s("b") && s("b") > s("c"), s.toString)
    assert(s("d") == 0L)
    // normalization: strengths sum to ~1e6 (floored division loses < #items)
    assert(math.abs(s.values.sum - 1000000L) <= s.size)

    val even = Seq(("x", "y", 7L), ("y", "x", 7L)).toDF("winner", "loser", "n_wins")
    val es = Preferences.bradleyTerry(even, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(es("x") == es("y"))
  }

  test("fitBradleyTerry: end-to-end over an event log is deterministic across runs") {
    val ev = (0 until 40).map(i =>
      (i.toLong, s"m${i % 4}", (i * 2654435761L % 97).toDouble)).toDF("id", "item", "score")
    val fit = () => Preferences.fitBradleyTerry(ev, expr("id div 2"),
      "item", "score", "id", iters = 3).orderBy("item").collect().toSeq
    assert(fit() == fit())
  }

  // --------------------------------------------------- templates, attribution

  test("templates: digit runs mask to '#', whitespace collapses, minDocs filters") {
    val docs = Seq(
      (1L, "order 123 shipped  to   zone 9"),
      (2L, "order 99871 shipped to zone 12"),
      (3L, "hello world"),
      (4L, "order 5 shipped to zone 0"),
      (5L, "hello world")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.templates(docs, "text", "doc_id")
      .orderBy("template").as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("hello world", 2L, 3L),
      ("order # shipped to zone #", 3L, 1L)))
  }

  test("lastTouchAttribution: credits the latest prior touch; no prior -> (direct); ties by id") {
    val ev = Seq(
      // user 1: view, click, purchase(10) -> click; purchase(5) -> click (still last)
      (1L, 1L, "view", 0.0), (2L, 1L, "click", 0.0),
      (3L, 1L, "purchase", 10.0), (4L, 1L, "purchase", 5.0),
      // user 2: purchase with no prior -> (direct)
      (5L, 2L, "purchase", 7.5),
      // user 3: same-ts tie — event_id orders view(6) before purchase(7)
      (6L, 3L, "view", 0.0), (7L, 3L, "purchase", 2.0)
    ).map { case (id, u, t, v) => (id, u, ts(100L), t, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = Timeseries.lastTouchAttribution(ev, "user_id",
        Seq("ts", "event_id"), "event_type", "value", "purchase")
      .orderBy("channel").as[(String, Long, Double)].collect().toSeq
    assert(r == Seq(("(direct)", 1L, 7.5), ("click", 2L, 15.0), ("view", 1L, 2.0)))
  }

  test("linearScoreScan edge contract: tokenless doc scores bias, NULL text scores NULL") {
    val docs = Seq((1L, "some words here"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val w = Seq.tabulate(8)(i => (i * 13L) % 21L - 10L)
    val r = TextAnalysis.linearScoreScan(docs, "text", "doc_id", w, biasMicro = 42L)
      .orderBy("doc").collect()
    assert(r(1).getLong(1) == 42L)      // empty text -> bias
    assert(r(2).isNullAt(1) && r(2).isNullAt(2)) // NULL text -> NULL logit+pred
  }

  // ---- joinViewDelta ----

  test("joinViewDelta equals the full-recompute bag difference, duplicates and delta×delta included") {
    import graft.operators.Warehouse
    // bags with DUPLICATE rows on both sides so the multiset identity is
    // exercised, and delta keys that hit old rows, delta rows, and nothing
    def mkA(rows: Seq[(Long, String)]) = rows.toDF("k", "av")
    def mkB(rows: Seq[(Long, String)]) = rows.toDF("k", "bv")
    val aOld = mkA(Seq((1L, "a1"), (1L, "a1"), (2L, "a2"), (5L, "a5")))
    val aNew = mkA(Seq((1L, "a1x"), (3L, "a3"), (9L, "a9")))
    val bOld = mkB(Seq((1L, "b1"), (3L, "b3"), (3L, "b3")))
    val bNew = mkB(Seq((2L, "b2"), (3L, "b3n"), (8L, "b8")))
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, String)].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    val delta = bag(Warehouse.joinViewDelta(aOld, aNew, bOld, bNew, Seq("k"))
      .select("k", "av", "bv"))
    val full = bag(aOld.union(aNew).join(bOld.union(bNew), "k")
      .select("k", "av", "bv"))
    val old = bag(aOld.join(bOld, "k").select("k", "av", "bv"))
    val expected = full.map { case (r, n) => r -> (n - old.getOrElse(r, 0)) }
      .filter(_._2 > 0)
    assert(delta == expected, s"delta: $delta\nexpected: $expected")
    // empty deltas maintain nothing
    assert(Warehouse.joinViewDelta(aOld, mkA(Nil), bOld, mkB(Nil),
      Seq("k")).count() == 0L)
  }
}

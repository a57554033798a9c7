package graft

import graft.operators.Sequences

/** Hand-computed fixtures for the sequence-analytics ops (the oracle pins
  * them on real data; these pin the edge semantics). */
class SequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, ty) => (u, t, ty) }.toDF("user_id", "ord", "event_type")

  test("markovTransitions: adjacent pairs only, per-from normalization, floored bp") {
    val df = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "z")) // single-event key contributes no transition
    val out = Sequences.markovTransitions(df, "user_id", "event_type", Seq("ord"))
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // from a: a→b ×2, a→c ×1 (3 total): 2/3 → 0.6666 floored, 1/3 → 0.3333
    // from b: b→a ×1 (u1 only; u2's b is last)
    assert(out == Seq(
      ("a", "b", 2L, 0.6666),
      ("a", "c", 1L, 0.3333),
      ("b", "a", 1L, 1.0)), s"got: $out")
  }

  test("markovTransitions: cross-user adjacency never pairs") {
    val df = ev((1L, 1L, "a"), (2L, 1L, "b"))
    assert(Sequences.markovTransitions(df, "user_id", "event_type", Seq("ord"))
      .count() == 0)
  }

  test("topPaths: windows of len-3, incomplete tails dropped, count-desc path-asc ties") {
    val df = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),
      (3L, 1L, "x"), (3L, 2L, "y")) // too short for any path
    val out = Sequences.topPaths(df, "user_id", "event_type", Seq("ord"),
      len = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("a > b > c", 2L),   // u1 and u2
      ("b > c > d", 1L)), s"got: $out")
  }

  test("topPaths: k truncates after the deterministic ordering") {
    val df = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"))
    val out = Sequences.topPaths(df, "user_id", "event_type", Seq("ord"),
      len = 3, k = 1)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("a > b > c", 1L)), s"got: $out") // tie broken by path asc
  }

  test("userSequences: ordered, truncated at maxLen, full count reported") {
    val df = ev((1L, 3L, "c"), (1L, 1L, "a"), (1L, 2L, "b"), (1L, 4L, "d"),
      (2L, 1L, "z"))
    val out = Sequences.userSequences(df, "user_id", "event_type",
        Seq("ord"), maxLen = 3)
      .orderBy("user_id")
      .as[(Long, Long, String)].collect().toSeq
    // user 1 has 4 events; the sequence carries only the first 3, in
    // event order regardless of arrival order
    assert(out == Seq((1L, 4L, "a > b > c"), (2L, 1L, "z")), s"got: $out")
  }

  test("userSequences is partitioning-invariant") {
    val df = (0 until 300).map(i =>
      ((i % 7).toLong, i.toLong, s"t${i % 5}")).toDF("user_id", "ord", "event_type")
    def run(parts: Int) = Sequences.userSequences(df.repartition(parts),
        "user_id", "event_type", Seq("ord"), maxLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(run(1) == run(13))
  }

  test("sessionize: session_window boundary semantics (exact gap merges, > splits), contiguous ids, exact durations") {
    import org.apache.spark.sql.functions._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(ms: Long) = new java.sql.Timestamp(base.getTime + ms)
    val gap = 1000L
    val df = Seq(
      (1L, at(0), 1L),
      (1L, at(1000), 2L), // gap == 1000 MERGES (session_window inclusive end)
      (1L, at(2001), 3L), // gap 1001 > 1000: new session
      (1L, at(2500), 4L),
      (2L, at(0), 5L))
      .toDF("user_id", "ts", "event_id")
    val got = Sequences.sessionize(df, "user_id", "ts",
        Seq("ts", "event_id"), gap)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L, 1000L), (1L, 2L, 2L, 499L),
      (2L, 1L, 1L, 0L)))
    // partitioning invariance
    val rep = Sequences.sessionize(df.repartition(7), "user_id", "ts",
        Seq("ts", "event_id"), gap)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep == got)
  }

  test("sessionize == session_window: the batch twin reproduces Spark's native grouping exactly") {
    import org.apache.spark.sql.functions._
    // pseudo-random event times with exact-boundary collisions planted
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (0 until 400).map { i =>
      val u = (i % 7).toLong
      val ms = (i / 7).toLong * 700L + (i * 37 % 5) * 300L
      (u, new java.sql.Timestamp(base.getTime + ms), i.toLong)
    } ++ Seq((9L, new java.sql.Timestamp(base.getTime), 1000L),
      (9L, new java.sql.Timestamp(base.getTime + 2000L), 1001L)) // exact gap
    val df = rows.toDF("user_id", "ts", "event_id")
    val native = df
      .groupBy(col("user_id"), session_window(col("ts"), "2 seconds"))
      .agg(count(lit(1)).as("n"), min("ts").as("s"), max("ts").as("e"))
      .select("user_id", "n", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3)))
      .toSet
    val batch = Sequences.sessionize(df, "user_id", "ts",
        Seq("ts", "event_id"), gapMillis = 2000L)
      .select(col("user_id"), col("n_events"), col("start_ts"), col("end_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2), r.get(3)))
      .toSet
    assert(batch == native,
      "batch sessionize must partition events exactly like session_window")
  }

  test("removalEffectAttribution: hand-computed fixture (truncation, taxonomy filter, direct conversion)") {
    // journeys: u1/u2 [A,conv]; u3 [B,null]; u4 [B,conv];
    // u5 [A,conv,(B,conv dropped — truncate at first conversion)];
    // u6 [conv] (START→CONV direct); u7 [A,(X ignored — not in taxonomy)]
    val df = ev(
      (1L, 1L, "A"), (1L, 2L, "conv"),
      (2L, 1L, "A"), (2L, 2L, "conv"),
      (3L, 1L, "B"),
      (4L, 1L, "B"), (4L, 2L, "conv"),
      (5L, 1L, "A"), (5L, 2L, "conv"), (5L, 3L, "B"), (5L, 4L, "conv"),
      (6L, 1L, "conv"),
      (7L, 1L, "A"), (7L, 2L, "X"))
    val got = Sequences.removalEffectAttribution(df, "user_id", Seq("ord"),
        "event_type", "conv", Seq("A", "B"), iters = 8)
      .orderBy("channel")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // transitions: START→{A:4, B:2, CONV:1}, A→{CONV:3, NULL:1},
    // B→{CONV:1, NULL:1}; converged: p(A)=750000, p(B)=500000,
    // p(START)=5e6 div 7=714285; removals: A→285714, B→571428
    assert(got == Seq(
      ("A", 714285L, 285714L, 428571L, 7500L),
      ("B", 714285L, 571428L, 142857L, 2500L)))
  }

  test("removalEffectAttribution: partitioning-invariant, zero-conversion corpus attributes nothing") {
    val df = ev((0 until 200).map(i =>
      ((i % 11).toLong, i.toLong, Seq("A", "B", "C", "conv")(i % 4))): _*)
    def run(parts: Int) = Sequences.removalEffectAttribution(
      df.repartition(parts), "user_id", Seq("ord"), "event_type", "conv",
      Seq("A", "B", "C")).collect().toSeq
    assert(run(1) == run(13))
    val dead = Sequences.removalEffectAttribution(
        ev((1L, 1L, "A"), (2L, 1L, "B")), "user_id", Seq("ord"),
        "event_type", "conv", Seq("A", "B"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(dead == Seq(("A", 0L, 0L, 0L, 0L), ("B", 0L, 0L, 0L, 0L)))
  }
}

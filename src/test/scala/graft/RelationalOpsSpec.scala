package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Batch relational helper coverage not already pinned by the oracle. */
class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 10k rows where 90% share one hot key
    val left = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = Seq((1L, "hot"), (11L, "cold"), (21L, "cold2")).toDF("k", "v")
    val plain = left.join(right, "k")
    val salted = RelationalOps.saltedJoin(left, right, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "v").as[(Long, Long, String)].collect().sorted
    val b = salted.select("k", "payload", "v").as[(Long, Long, String)].collect().sorted
    assert(a.toSeq == b.toSeq)
  }

  test("rangeBucketJoin equals the naive BETWEEN join on overlapping intervals") {
    val fact = spark.range(0, 200)
      .select(col("id"), (col("id") * 7 % 100).cast("double").as("v"))
    // overlapping bands incl. one spanning many buckets and a zero-width one
    val dims = Seq(
      ("wide", 0.0, 90.0), ("mid", 20.0, 50.0), ("hi", 45.0, 100.0),
      ("empty", 30.0, 30.0)).toDF("band", "lo", "hi")
    val naive = fact.join(dims, col("v") >= col("lo") && col("v") < col("hi"))
    val bucketed = RelationalOps.rangeBucketJoin(fact, "v", dims, "lo", "hi",
      bucketWidth = 15.0)
    val a = naive.select("id", "band").as[(Long, String)].collect().sorted.toSeq
    val b = bucketed.select("id", "band").as[(Long, String)].collect().sorted.toSeq
    assert(a == b)
    assert(!b.exists(_._2 == "empty")) // [30, 30) matches nothing
    // the rewrite must plan an EQUI hash join, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop survived:\n$plan")
  }

  test("rangeBucketJoin: a fact row matching one interval via several dim buckets appears once") {
    val fact = Seq(42.0).toDF("v")
    val dims = Seq(("all", 0.0, 1000.0)).toDF("band", "lo", "hi") // 100 buckets wide
    val out = RelationalOps.rangeBucketJoin(fact, "v", dims, "lo", "hi", 10.0)
    assert(out.count() == 1)
  }

  test("fixedWidthHistogram: hand-computed bins, sentinel under/overflow, NaN to overflow, null dropped") {
    val df = Seq[java.lang.Double](50.0, 100.0, 114.9, 115.0, 399.99, 400.0,
      1000.0, null, Double.NaN).toDF("v")
    val out = RelationalOps.fixedWidthHistogram(df, "v", lo = 100.0,
      hi = 400.0, nBins = 20)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(out == Seq(
      (-1L, 1L, None, None),                        // 50 → underflow
      (0L, 2L, Some(100.0), Some(115.0)),           // 100, 114.9
      (1L, 1L, Some(115.0), Some(130.0)),           // 115 (boundary goes up)
      (19L, 1L, Some(385.0), Some(400.0)),          // 399.99
      (20L, 3L, None, None)), s"got: $out")         // 400, 1000, NaN overflow
  }

  test("funnelSteps: ordered matching, span cut, strict-after ties, missing middle step") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: full funnel within span
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: click outside the 7-day span from the anchor
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-09 10:00:00")),
      // u3: click BEFORE the anchor view never matches
      (3L, "click", ts("2024-01-01 10:00:00")),
      (3L, "view", ts("2024-01-01 11:00:00")),
      (3L, "purchase", ts("2024-01-01 10:30:00")),
      // u4: no click at all — purchase can't skip the middle step
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-01 11:00:00")),
      // u5: never anchors (no view)
      (5L, "click", ts("2024-01-01 10:00:00")),
      (5L, "purchase", ts("2024-01-01 11:00:00")),
      // u6: same-ts click is NOT strictly after the view; the later one is;
      //     purchase before the MATCHED click fails
      (6L, "view", ts("2024-01-01 10:00:00")),
      (6L, "click", ts("2024-01-01 10:00:00")),
      (6L, "click", ts("2024-01-01 10:00:01")),
      (6L, "purchase", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = RelationalOps.funnelSteps(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), "7 DAY")
      .orderBy("step")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "view", 5L, 1.0),
      (2L, "click", 2L, 0.4),      // u1, u6
      (3L, "purchase", 1L, 0.2)),  // u1
      s"got: $out")
  }

  test("cohortRetention: first-activity cohorts, offsets, within-period dedup") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")),  // u1 wk0
      (1L, ts("2024-01-09 10:00:00")),  // u1 wk1
      (1L, ts("2024-01-23 10:00:00")),  // u1 wk3
      (2L, ts("2024-01-10 10:00:00")),  // u2 wk1 only
      (3L, ts("2024-01-03 10:00:00")),  // u3 wk0 ...
      (3L, ts("2024-01-05 10:00:00"))   // ... twice in wk0 → counts once
    ).toDF("user_id", "ts")
    val out = RelationalOps.cohortRetention(ev, "user_id", "ts",
      "2024-01-01", bucketDays = 7)
      .orderBy("cohort_wk", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L), (1L, 0L, 1L)), s"got: $out")
  }

  test("scd2Intervals: change compression, interval chaining, null-payload change, open current row") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00"), 1L),
      (1L, "A", ts("2024-01-01 11:00:00"), 2L),   // unchanged → compressed
      (1L, "B", ts("2024-01-01 12:00:00"), 3L),
      (1L, "A", ts("2024-01-01 13:00:00"), 4L),   // back to A = a new interval
      (2L, "A", ts("2024-01-01 10:00:00"), 5L),
      (3L, null, ts("2024-01-01 10:00:00"), 6L),  // null payload is a real state
      (3L, null, ts("2024-01-01 11:00:00"), 7L),  // ... unchanged (null-safe)
      (3L, "A", ts("2024-01-01 12:00:00"), 8L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = RelationalOps.scd2Intervals(ev, "user_id",
      Seq("ts", "event_id"), Seq("event_type"))
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSeq
    assert(out == Seq(
      (1L, Some("A"), ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00"))),
      (1L, Some("B"), ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 13:00:00"))),
      (1L, Some("A"), ts("2024-01-01 13:00:00"), None),
      (2L, Some("A"), ts("2024-01-01 10:00:00"), None),
      (3L, None, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00"))),
      (3L, Some("A"), ts("2024-01-01 12:00:00"), None)), s"got: $out")
  }

  test("joinProfile: hand-computed sides, null-key exclusion, exact output cardinality") {
    val l = Seq[Option[Long]](Some(1L), Some(1L), Some(2L), None).toDF("k")
    val r = Seq[Option[Long]](Some(1L), Some(3L), Some(3L), None, None).toDF("k")
    val out = RelationalOps.joinProfile(l, "k", r, "k")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // est: key 1 → 2 left × 1 right = 2 output rows (== actual inner join)
    assert(out == Seq((3L, 2L, 1L, 3L, 2L, 2L, 1L, 2L)), s"got: $out")
    assert(l.join(r, "k").count() == 2L)
  }

  test("keySkewReport: hand-computed counts, shares, skew; null key reported and tie-broken last") {
    // a×5, b×3, null×3, c×1 → total 12, 4 keys, mean 3/key. top-3 is a,
    // then the b/null tie at 3 rows — null pins LAST, so b precedes it.
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(3)(null: String) ++ Seq("c")).toDF("k")
    val out = RelationalOps.keySkewReport(df, "k", topK = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    // floored basis-points: share a = floor(10000·5/12)/1e4, skew a =
    // floor(100·5·4/12)/100
    assert(out == Seq(
      (Some("a"), 5L, 0.4166, 1.66),
      (Some("b"), 3L, 0.25, 1.0),
      (None, 3L, 0.25, 1.0)), s"got: $out")
  }

  test("saltedJoin salt is deterministic: identical bucket layout across executions") {
    // Content-hash salt (not monotonically_increasing_id) means the same row
    // lands in the same salt bucket on every execution — including the
    // partition it shuffles to. Compare per-bucket memberships directly by
    // re-deriving the salt column the way saltedJoin does.
    val left = spark.range(5000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"), col("id").as("payload"))
    def buckets() = left
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .groupBy("__salt").agg(sum("payload").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val first = buckets()
    assert(buckets() == first, "salt layout must be identical across executions")
    // and the hot key actually spreads: its rows occupy >1 bucket
    val hotSpread = left.filter(col("k") === 1L)
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(hotSpread > 1, "hot key must spread across salt buckets")
  }

  test("saltedJoin works on schemas with map-typed columns (salt skips them)") {
    // hash() rejects MapType at analysis time; the salt must derive from
    // the hashable columns only, not fail the whole join.
    val left = spark.range(100)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"),
        map(lit("a"), col("id")).as("attrs"))
    val right = Seq((1L, "hot"), (11L, "cold")).toDF("k", "v")
    val salted = RelationalOps.saltedJoin(left, right, "k", saltBuckets = 4)
    assert(salted.count() == left.join(right, "k").count())
  }

  test("writePartitioned lays out hive partitions with bounded file counts") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 4).cast("string").as("part"), (col("id") * 2).as("v"))
    graft.operators.Outputs.writePartitioned(df, dir, "part", filesPerPartition = 2, Seq("id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    val partDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part="))
    assert(partDirs.length == 4)
    // partition pruning works on the layout
    val pruned = back.filter(col("part") === "1")
    assert(pruned.count() == 250)
    assert(pruned.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      .contains("PartitionFilters: [isnotnull(part"))
  }

  test("shardAssignments: balanced, deterministic, positions contiguous per shard") {
    val docs = spark.range(4000).select(col("id").as("doc_id"))
    val a = graft.operators.Outputs.shardAssignments(docs, "doc_id", numShards = 8)
      .cache()
    // every doc lands in exactly one shard
    assert(a.count() == 4000)
    // balance: the multiplicative hash spreads source-contiguous ids —
    // every shard within ±25% of n/N (contiguous assignment would fail
    // this badly; a uniform hash passes with huge margin)
    val sizes = a.groupBy("shard_id").count().select("count")
      .as[Long].collect()
    assert(sizes.length == 8)
    assert(sizes.forall(s => s > 375 && s < 625), s"imbalanced: ${sizes.toSeq}")
    // positions are a permutation of 0..size-1 within each shard
    val posOk = a.groupBy("shard_id")
      .agg(min("pos_in_shard").as("mn"), max("pos_in_shard").as("mx"),
        countDistinct("pos_in_shard").as("nd"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(posOk.count() == 0, "pos_in_shard must be 0..n-1 per shard")
    // POWER-OF-TWO MIXING (regression): the Knuth multiplier is ≡ 1 mod 8,
    // so shard = hash mod 8 DIRECTLY would be id mod 8 — ids allocated
    // with stride 8 (per-worker ranges, fixed low bits) would all land in
    // ONE shard. The prime-mod intermediate must spread them.
    val strided = spark.range(1000).select((col("id") * 8).as("doc_id"))
    val sSizes = graft.operators.Outputs.shardAssignments(strided, "doc_id", 8)
      .groupBy("shard_id").count().select("count").as[Long].collect()
    assert(sSizes.length == 8 && sSizes.forall(s => s > 60 && s < 190),
      s"stride-8 ids must spread over all 8 shards: ${sSizes.toSeq}")
    // deterministic: a second run reproduces the exact layout
    val b = graft.operators.Outputs.shardAssignments(docs, "doc_id", numShards = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // scramble decorrelates ingest order: consecutive ids rarely share a shard
    val adj = a.as[(Long, Long, Long)].collect().sortBy(_._1)
      .sliding(2).count(w => w(0)._2 == w(1)._2)
    assert(adj < 1000, s"consecutive ids must scatter across shards, got $adj/3999 colocated")
    a.unpersist()
  }

  test("writeTrainingShards lays out shard directories in scramble order") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    graft.operators.Outputs.writeTrainingShards(docs, "doc_id", numShards = 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard_id="))
    assert(shardDirs.length == 4)
    // payload columns ride through; assignment matches the operator
    val expected = graft.operators.Outputs.shardAssignments(docs, "doc_id", 4)
      .select(col("doc_id"), col("shard_id"))
    assert(back.select("doc_id", "shard_id").exceptAll(expected).isEmpty)
  }

  test("intervalJoin only pairs rows inside the time bound") {
    val l = Seq((1L, ts(1000)), (2L, ts(5000))).toDF("user_id", "ts")
    val r = Seq((1L, ts(1000 + 1800)), (1L, ts(1000 + 7200)), (2L, ts(4000))).toDF("user_id", "ts")
    val out = RelationalOps.intervalJoin(l, r, "user_id", "ts", "ts", "1 HOUR")
    // user1: +30min in, +2h out; user2: r.ts before l.ts -> out
    assert(out.count() == 1)
  }

  test("asofJoin matches a brute-force inequality-join formulation on seeded random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i => (s"k${rnd.nextInt(10)}", ts(rnd.nextInt(1000)), i.toLong))
      .toDF("k", "ts", "ev")
    val right0 = (1 to 200).map(i => (s"k${rnd.nextInt(12)}", ts(rnd.nextInt(1000)), i.toLong))
      .toDF("k", "rts", "v")
    val r = right0.groupBy("k", "rts").agg(max("v").as("v")) // unique (k, rts)
    val out = RelationalOps.asofJoin(left, r, "k", "ts", "rts", Seq("v"))
      .select("k", "ev", "v").as[(String, Long, Option[Long])].collect().toSet
    // independent formulation: range theta-join + row_number — the exact
    // quadratic shape asofJoin exists to avoid, used here as the oracle
    val joined = left.as("l").join(r.as("r"),
      expr("l.k = r.k AND r.rts <= l.ts"), "left")
    val w = Window.partitionBy(col("l.ev")).orderBy(col("r.rts").desc)
    val expect = joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l.k"), col("l.ev"), col("r.v"))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(out == expect)
    assert(out.size == 300, "every left row appears exactly once")
  }

  test("asofJoin: a null right VALUE is a real match, not skipped for an older row") {
    val left = Seq(("u1", ts(30), "click")).toDF("k", "ts", "what")
    val right = Seq(("u1", ts(10), Option(100L)), ("u1", ts(20), Option.empty[Long]))
      .toDF("k", "rts", "v")
    val out = RelationalOps.asofJoin(left, right, "k", "ts", "rts", Seq("v")).collect()
    assert(out.length == 1)
    // the as-of row is (u1, ts20, null) — a per-column ignoreNulls would
    // wrongly resurrect the older 100
    assert(out(0).isNullAt(out(0).fieldIndex("v")),
      s"expected the ts=20 null value, got ${out(0)}")
  }

  test("gapFill: missing buckets appear with n_events=0 and the forward-filled value") {
    // key "a": events in hours 0, 1, 3 — hour 2 is the gap; key "b": one
    // hour only (no grid beyond it, no cross-key leakage).
    val events = Seq(
      ("a", ts(0), 1.25), ("a", ts(100), 1.25),   // hour 0: two events, sum 2.50
      ("a", ts(3600), 7.75),                       // hour 1
      ("a", ts(3 * 3600), 0.50),                   // hour 3
      ("b", ts(3600), 9.99)
    ).toDF("k", "ts", "value")
    val out = RelationalOps.gapFill(events, "ts", Seq("k"), "value")
      .orderBy("k", "bucket")
      .select("k", "n_events", "filled_value", "is_gap")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 2L, 2.50, false),   // hour 0
      ("a", 1L, 7.75, false),   // hour 1
      ("a", 0L, 7.75, true),    // hour 2: GAP — carries hour 1's value
      ("a", 1L, 0.50, false),   // hour 3
      ("b", 1L, 9.99, false)))
  }

  test("topKPerGroup: per-group best-k, small groups whole, ties to smaller id, NaN dropped") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 7.0), ("a", 4L, 9.0), // tie at 9.0
      ("b", 5L, 1.0),                                                 // group smaller than k
      ("c", 6L, Double.NaN), ("c", 7L, 2.0)                           // NaN never ranks
    ).toDF("grp", "id", "score")
    val out = RelationalOps.topKPerGroup(df, "grp", "id", "score", k = 2)
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", 1L, 2L, 9.0), ("a", 2L, 4L, 9.0),  // tie broken by smaller id
      ("b", 1L, 5L, 1.0),
      ("c", 1L, 7L, 2.0)), s"got: $out")
    // equals the window formulation on clean (non-NaN) input
    import org.apache.spark.sql.expressions.Window
    val clean = df.filter(!isnan(col("score")))
    val win = clean.withColumn("rank",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("score").desc, col("id"))).cast("long"))
      .filter(col("rank") <= 2).select("grp", "rank", "id", "score")
    assert(RelationalOps.topKPerGroup(clean, "grp", "id", "score", 2)
      .exceptAll(win).isEmpty && win.exceptAll(
        RelationalOps.topKPerGroup(clean, "grp", "id", "score", 2)).isEmpty)
    // plan shape: bounded ObjectHashAggregate, never a Window sort
    val plan = RelationalOps.topKPerGroup(df, "grp", "id", "score", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"),
      s"bounded aggregate, no window:\n$plan")
  }

  test("bucketed tables join with ZERO exchanges (write-once shuffle)") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("a"))
      val other = spark.range(500).select(col("id").as("k"), (col("id") * 7).as("b"))
      graft.operators.Outputs.writeBucketed(facts, "bkt_facts", Seq("k"), 4)
      graft.operators.Outputs.writeBucketed(other, "bkt_other", Seq("k"), 4)
      val joined = spark.table("bkt_facts").join(spark.table("bkt_other"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"same-bucketing join must not shuffle either side:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_other")
    }
  }

  // ---- robust outliers (median / MAD modified z) ----

  test("robustOutliers: hand-computed median, MAD, z, and flags") {
    // cents: 1000 1050 1100 1150 1200 10000 → median (1100+1150)/2 = 1125;
    // devs 125 75 25 25 75 8875 → MAD (75+75)/2 = 75.
    // z in FLOORED-toward-zero basis points (the exact-integer lane):
    // z(100.00) = 0.6745·8875/75 = 79.8158(3) → 79.8158; max normal |z| =
    // 0.6745·125/75 = 1.12416̄ → truncates to 1.1241 — only the planted
    // row flags at cutoff 3.5.
    val df = Seq((1L, "a", 10.00), (2L, "a", 10.50), (3L, "a", 11.00),
      (4L, "a", 11.50), (5L, "a", 12.00), (6L, "a", 100.00))
      .toDF("event_id", "event_type", "value")
    val out = RelationalOps.robustOutliers(df, "value", "event_type", Seq("event_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out(6L) == ((11.25, 0.75, 79.8158, true)), s"${out(6L)}")
    assert(out(1L) == ((11.25, 0.75, -1.1241, false)))
    assert(out(3L)._3 == -0.2248 && !out(3L)._4)
    assert(out.values.count(_._4) == 1)
  }

  test("robustOutliers: a MAD-0 group yields NULL z and flag, not Inf/NaN") {
    val df = Seq((1L, "b", 5.00), (2L, "b", 5.00), (3L, "b", 5.00),
      (4L, "b", 5.00), (5L, "b", 9.00))
      .toDF("event_id", "event_type", "value")
    val out = RelationalOps.robustOutliers(df, "value", "event_type", Seq("event_id"))
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.isNullAt(5) && r.isNullAt(6), s"expected NULL z/flag: $r")
      assert(r.getDouble(4) == 0.0) // the MAD itself is reported
    }
  }

  test("robustOutliers: the outlier cannot mask itself (50% breakdown)") {
    // same fixture but the outlier is 1000× farther — median/MAD unchanged,
    // so every other row's flag is identical (a mean/stddev z would have
    // inflated sigma and unflagged the outlier's neighbors' scores)
    def flags(extreme: Double) = RelationalOps.robustOutliers(
      Seq((1L, "a", 10.00), (2L, "a", 10.50), (3L, "a", 11.00),
        (4L, "a", 11.50), (5L, "a", 12.00), (6L, "a", extreme))
        .toDF("event_id", "event_type", "value"),
      "value", "event_type", Seq("event_id"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4), r.getBoolean(6))).toMap
    val (near, far) = (flags(100.0), flags(100000.0))
    assert(near.view.filterKeys(_ != 6L).toMap == far.view.filterKeys(_ != 6L).toMap)
    assert(far(6L)._3 && far(6L)._1 == 11.25 && far(6L)._2 == 0.75)
  }

  test("snapshotDiff: all four statuses, multi-column fingerprint") {
    val oldSnap = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "p1", "p2")
    val newSnap = Seq((1L, "a", "x"), (2L, "b", "CHANGED"), (4L, "d", "w"))
      .toDF("id", "p1", "p2")
    val out = RelationalOps.snapshotDiff(oldSnap, newSnap, "id", Seq("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got: $out")
  }

  test("snapshotDiff: the delimiter prevents concat collisions across columns") {
    // ("ab","c") vs ("a","bc") concatenate to the same string — the
    //  delimiter must keep them distinct
    val oldSnap = Seq((1L, "ab", "c")).toDF("id", "p1", "p2")
    val newSnap = Seq((1L, "a", "bc")).toDF("id", "p1", "p2")
    val out = RelationalOps.snapshotDiff(oldSnap, newSnap, "id", Seq("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed"), s"got: $out")
  }

  test("profileColumns: nulls, exact distincts, and min/max per column") {
    val df = Seq(
      (1L, Some("a"), 10L),
      (2L, None, 10L),
      (3L, Some("b"), 30L),
      (4L, Some("a"), 30L)
    ).toDF("id", "tag", "v")
    val out = RelationalOps.profileColumns(df, Seq(
        "id" -> col("id"), "tag" -> col("tag"), "v" -> col("v")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out("id") == ((4L, 0L, 4L, "1", "4")), s"got: $out")
    // null is not a distinct value; min/max skip it
    assert(out("tag") == ((4L, 1L, 2L, "a", "b")), s"got: $out")
    assert(out("v") == ((4L, 0L, 2L, "10", "30")), s"got: $out")
  }

  test("expectations: exact counts, budget edge inclusive, one pass for all rules") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, -5.0), (4L, 30.0)).toDF("id", "v")
    val out = RelationalOps.expectations(df, Seq(
        ("no_negatives", col("v") < 0, 0),          // 1/4 viol → fail
        ("quarter_budget", col("v") < 0, 2500),     // exactly at budget → pass
        ("under_budget", col("v") < 0, 2501)))      // just above → pass
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("no_negatives") == ((1L, 2500L, false)), s"got: $out")
    assert(out("quarter_budget") == ((1L, 2500L, true)),
      "a violation rate exactly at budget passes (<=)")
    assert(out("under_budget")._3)
  }

  test("populationStability: identical samples ≈ 0, a planted shift is positive") {
    val ref = (1L to 400L).map(i => i % 100).toDF("v")
    val same = (1L to 400L).map(i => i % 100).toDF("v")
    val shifted = (1L to 400L).map(i => i % 100 + 150).toDF("v")
    def psi(cur: org.apache.spark.sql.DataFrame) =
      RelationalOps.populationStability(ref, cur, "v", lo = 0, width = 50,
        nBuckets = 6).agg(sum("term_micro")).collect().head.getLong(0) / 1e6
    assert(math.abs(psi(same)) < 1e-4, s"identical → ~0, got ${psi(same)}")
    assert(psi(shifted) > 0.25, s"a hard shift must cross the act line, got ${psi(shifted)}")
    // panel covers every bucket, including ones empty on both sides
    val panel = RelationalOps.populationStability(ref, shifted, "v", 0, 50, 6)
      .collect()
    assert(panel.length == 6)
  }

  test("cupedMeans: hand-computed pooled theta adjusts variant means exactly") {
    // pooled: n=4 Σx=70 Σy=104 Σxx=1500 Σxy=2260 → θ = 1760/1100 = 1.6,
    // grand mean_x = 17.5. A: mean_y 35, mean_x 20 → adj 35 − 1.6·2.5 = 31.
    // B: mean_y 17, mean_x 15 → adj 17 + 1.6·2.5 = 21 (negative branch).
    val per = Seq(("A", 10L, 20L), ("A", 30L, 50L),
      ("B", 10L, 12L), ("B", 20L, 22L)).toDF("variant", "x", "y")
    val out = RelationalOps.cupedMeans(per, "variant", "y", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("A") == ((2L, 35.0, 31.0)), s"got: $out")
    assert(out("B") == ((2L, 17.0, 21.0)), s"got: $out")
  }

  test("cupedMeans: zero covariate variance means zero adjustment") {
    val per = Seq(("A", 5L, 10L), ("A", 5L, 30L), ("B", 5L, 6L))
      .toDF("variant", "x", "y")
    val out = RelationalOps.cupedMeans(per, "variant", "y", "x")
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("A") == ((20.0, 20.0)) && out("B") == ((6.0, 6.0)),
      s"θ must fall back to 0, got: $out")
  }

  test("profileColumns: an all-null column profiles without error") {
    val df = Seq(1L, 2L).toDF("id")
      .withColumn("empty", lit(null).cast("string"))
    val out = RelationalOps.profileColumns(df, Seq("empty" -> col("empty")))
      .collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L && out.getLong(3) == 0L)
    assert(out.isNullAt(4) && out.isNullAt(5))
  }

  test("point-in-time composition (scd2 ∘ asof) never leaks a future version") {
    val changes = Seq((7L, 10L, 1L), (7L, 10L, 1L), (7L, 20L, 2L))
      .toDF("k", "t", "tier") // duplicate payload compresses away
    val hist = RelationalOps.scd2Intervals(changes, "k", Seq("t"), Seq("tier"))
    val facts = Seq((100L, 7L, 5L), (101L, 7L, 10L), (102L, 7L, 15L),
      (103L, 7L, 25L)).toDF("fid", "k", "t")
    val out = RelationalOps.asofJoin(facts,
        hist.select(col("k"), col("valid_from").as("t"), col("tier")),
        "k", "t", "t", Seq("tier"))
      .select("fid", "tier")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(100L -> None, 101L -> Some(1L), 102L -> Some(1L),
      103L -> Some(2L)),
      s"pre-history NULL, in-interval version, never a future one: $out")
  }

  test("gateAttrition: first-failure attribution sums to total kills") {
    val df = Seq((true, true), (false, true), (true, false), (false, false))
      .toDF("g1", "g2")
    val out = RelationalOps.gateAttrition(df, Seq("g1", "g2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out(1L) == (("g1", 4L, 2L, 2L, 2L)), s"got: ${out(1L)}")
    // g2's attributed kills exclude the rows g1 already killed
    assert(out(2L) == (("g2", 4L, 2L, 1L, 1L)), s"got: ${out(2L)}")
  }

  test("gateAttrition: NULL gate flags count as kills, invariant holds") {
    // nullable flags: NULL is neither true nor false under three-valued
    // logic, which used to leave those rows out of BOTH the killed and
    // surviving counts — the operator coalesces NULL to fail
    val df = Seq[(java.lang.Boolean, java.lang.Boolean)](
      (true, null), (null, true), (true, true), (false, null))
      .toDF("g1", "g2")
    val out = RelationalOps.gateAttrition(df, Seq("g1", "g2"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // g1 kills rows 2 and 4 (null + false); rows 1 and 3 survive it
    assert(out(1L) == (("g1", 4L, 2L, 2L, 2L)), s"got: ${out(1L)}")
    // of the 2 g1-survivors, g2 kills row 1 (null), row 3 survives —
    // attributed kills (2 + 1) + final survivors (1) = total rows
    assert(out(2L) == (("g2", 4L, 2L, 1L, 1L)), s"got: ${out(2L)}")
  }

  test("idGaps: planted holes, duplicates collapsed, contiguous data silent") {
    val ids = Seq(1L, 2L, 3L, 3L, 7L, 10L).toDF("id")
    val out = RelationalOps.idGaps(ids, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((4L, 6L, 3L), (8L, 9L, 2L)), s"got: $out")
    assert(RelationalOps.idGaps(Seq(5L, 6L, 7L).toDF("id"), "id").count() == 0)
  }

  test("benfordPanel: hand-counted digits vs the floored-bp expectation literals") {
    val df = Seq(1L, 19L, 25L, 29L, 999L, 0L, -5L).toDF("v")
    val out = RelationalOps.benfordPanel(df, "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((2L, 4000L, 3010L)), 2L -> ((2L, 4000L, 1760L)),
      9L -> ((1L, 2000L, 457L))), s"zero/negative excluded: $out")
  }

  test("decadeHistogram: digit-count decades, spans, zero/negative excluded") {
    val df = Seq(("a", 5L), ("a", 9L), ("a", 42L), ("a", 999L), ("a", 1000L),
      ("a", 0L), ("a", -7L), ("b", 123456L))
      .toDF("g", "v")
    val out = RelationalOps.decadeHistogram(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      ("a", 0L) -> ((2L, 5L, 9L)), ("a", 1L) -> ((1L, 42L, 42L)),
      ("a", 2L) -> ((1L, 999L, 999L)), ("a", 3L) -> ((1L, 1000L, 1000L)),
      ("b", 5L) -> ((1L, 123456L, 123456L))), s"got: $out")
  }

  test("weightedMedian: weight mass decides, not row counts; nonpositive weights drop") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L),
      ("b", 5L, 3L), ("b", 7L, 1L), ("b", 9L, 0L))
      .toDF("g", "v", "w")
    val out = RelationalOps.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map("a" -> ((3L, 12L)), "b" -> ((5L, 4L))), s"got: $out")
  }

  test("kAnonymity flags small classes; suppression drops exactly their rows") {
    val df = (Seq.fill(5)(("US", "auto")) ++ Seq.fill(2)(("US", "bike")) ++
      Seq.fill(3)(("DE", "auto"))).zipWithIndex
      .map { case ((n, s), i) => (i.toLong, n, s) }
      .toDF("id", "nation", "segment")
    val audit = RelationalOps.kAnonymity(df, Seq("nation", "segment"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(audit == Map(("US", "auto") -> ((5L, false)),
      ("US", "bike") -> ((2L, true)), ("DE", "auto") -> ((3L, false))),
      s"got: $audit")
    // USING-column joins list the join keys first: (nation, segment, id)
    val kept = RelationalOps.kAnonymitySuppress(df, Seq("nation", "segment"),
        k = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("US", "auto"), ("DE", "auto")),
      s"only the violating class vanishes: $kept")
  }

  test("dpGroupCounts/dpGroupSum: seeded Laplace matches the sequential formula; clamp bounds sensitivity; determinism") {
    // reference implementation of the seeded noise, sequential
    def refNoise(key: String, salt: String, bMicro: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 0.5) / 4294967296.0
      val c = u - 0.5
      math.round(math.signum(c) *
        (bMicro.toDouble / 1e6) * -math.log(1.0 - 2.0 * math.abs(c)))
    }
    val df = (Seq.fill(40)("a") ++ Seq.fill(10)("b")).toDF("g")
    val out = RelationalOps.dpGroupCounts(df, "g",
        epsilonMicro = 500000L, releaseNonce = "s1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = 1000000000000L / 500000L
    assert(out("a") == 40L + refNoise("a", "s1", b), s"got $out")
    assert(out("b") == 10L + refNoise("b", "s1", b), s"got $out")
    // determinism: the same salt reproduces; a different salt re-draws
    val out2 = RelationalOps.dpGroupCounts(df, "g", 500000L, "s1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == out, "seeded release must replay bit-identically")
    // sums: the clamp bounds each row's contribution BEFORE the sum
    val v = Seq(("a", 50L), ("a", 5000L), ("a", -30L), ("b", 100L))
      .toDF("g", "cents")
    val sums = RelationalOps.dpGroupSum(v, "g", col("cents"),
        clampCents = 1000L, epsilonMicro = 1000000L, releaseNonce = "s2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bs = 1000L * (1000000000000L / 1000000L)
    // a: 50 + 1000 (clamped) + 0 (negative clamps to 0) = 1050
    assert(sums("a") == 1050L + refNoise("a", "s2", bs), s"got $sums")
    assert(sums("b") == 100L + refNoise("b", "s2", bs), s"got $sums")
    // scale sanity: ε=0.5, sensitivity 1 → |noise| rarely exceeds ~15
    assert(math.abs(out("a") - 40L) <= 20L && math.abs(out("b") - 10L) <= 20L)
  }

  test("dp releases: a public key domain fixes the support; empty nonce rejected") {
    // data has groups {a, b, d}; the PUBLIC domain is {a, b, c}: the
    // release must cover exactly the domain — c (absent from the data)
    // gets a noised ZERO, d (outside the domain) is not released — so
    // removing any record never changes which keys appear
    def refNoise(key: String, nonce: String, bMicro: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((nonce + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 0.5) / 4294967296.0
      val c = u - 0.5
      math.round(math.signum(c) *
        (bMicro.toDouble / 1e6) * -math.log(1.0 - 2.0 * math.abs(c)))
    }
    val df = (Seq.fill(12)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("d"))
      .toDF("g")
    val dom = Seq("a", "b", "c").toDF("g")
    val b = 1000000000000L / 500000L
    val out = RelationalOps.dpGroupCounts(df, "g", 500000L, "dom1",
        keyDomain = Some(dom))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("a", "b", "c"),
      s"support must be the domain, independent of the data: ${out.keySet}")
    assert(out("a") == 12L + refNoise("a", "dom1", b))
    assert(out("c") == 0L + refNoise("c", "dom1", b),
      "an absent group releases a noised zero, not nothing")
    // same contract on the sum lane
    val v = Seq(("a", 500L), ("d", 100L)).toDF("g", "cents")
    val bs = 1000L * (1000000000000L / 1000000L)
    val sums = RelationalOps.dpGroupSum(v, "g", col("cents"),
        clampCents = 1000L, epsilonMicro = 1000000L,
        releaseNonce = "dom2", keyDomain = Some(dom))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.keySet == Set("a", "b", "c"))
    assert(sums("b") == 0L + refNoise("b", "dom2", bs))
    // nonce reuse across releases is the attack — empty is never legal
    intercept[IllegalArgumentException] {
      RelationalOps.dpGroupCounts(df, "g", 500000L, "")
    }
    intercept[IllegalArgumentException] {
      RelationalOps.dpGroupSum(v, "g", col("cents"), 1000L, 1000000L, "")
    }
  }

  test("dpUserCounts: a heavy user contributes at most the cap; sensitivity scales the noise") {
    def refNoise(key: String, nonce: String, bMicro: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((nonce + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 0.5) / 4294967296.0
      val c = u - 0.5
      math.round(math.signum(c) *
        (bMicro.toDouble / 1e6) * -math.log(1.0 - 2.0 * math.abs(c)))
    }
    // user u1 owns 100 rows of group a (clamps to 3), u2 owns 2 (stays
    // 2), u3 owns 5 of b (clamps to 3): a = 5, b = 3 before noise
    val df = (Seq.fill(100)(("a", "u1")) ++ Seq.fill(2)(("a", "u2")) ++
      Seq.fill(5)(("b", "u3"))).toDF("g", "u")
    val b = 3L * (1000000000000L / 500000L) // sensitivity = cap = 3
    val out = RelationalOps.dpUserCounts(df, "g", "u", capPerUser = 3L,
        epsilonMicro = 500000L, releaseNonce = "usr1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out("a")._1 == 5L + refNoise("a", "usr1", b),
      s"heavy user clamps to the cap before the sum: $out")
    assert(out("b")._1 == 3L + refNoise("b", "usr1", b))
    assert(out.values.forall(_._2 == 3L), "the release records its cap")
    // the domain mode composes: absent group released as noised zero
    val dom = Seq("a", "b", "c").toDF("g")
    val outD = RelationalOps.dpUserCounts(df, "g", "u", 3L, 500000L,
        "usr2", keyDomain = Some(dom))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(outD.keySet == Set("a", "b", "c"))
    assert(outD("c") == 0L + refNoise("c", "usr2", b))
  }

  test("dpStableCounts: only groups whose noisy count clears tau are released") {
    def refNoise(key: String, nonce: String, bMicro: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((nonce + key).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 0.5) / 4294967296.0
      val c = u - 0.5
      math.round(math.signum(c) *
        (bMicro.toDouble / 1e6) * -math.log(1.0 - 2.0 * math.abs(c)))
    }
    // common: 60 rows (clears any reasonable tau); rare: 2 rows (the
    // identifying string the threshold exists to drop); mid: 9 rows
    // (whether it ships depends on ITS noise draw — assert exactly that)
    val df = (Seq.fill(60)("common") ++ Seq.fill(2)("rare-secret") ++
      Seq.fill(9)("mid")).toDF("g")
    val b = 1000000000000L / 500000L
    val tau = 10L
    val out = RelationalOps.dpStableCounts(df, "g", 500000L, tau, "vocab1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val expect = Seq("common" -> 60L, "rare-secret" -> 2L, "mid" -> 9L)
      .map { case (k, n) => k -> (n + refNoise(k, "vocab1", b)) }
      .filter(_._2 >= tau).toMap
    assert(out.view.mapValues(_._1).toMap == expect, s"got $out want $expect")
    assert(out.contains("common") && !out.contains("rare-secret"),
      "the frequent group ships, the rare identifying string never does")
    assert(out.values.forall(_._2 == tau), "the release records its threshold")
    intercept[IllegalArgumentException] {
      RelationalOps.dpStableCounts(df, "g", 500000L, 0L, "vocab1")
    }
  }

  test("tCloseness: concentrated groups score the CDF gap, matched ones score 0") {
    // global over values {1,2}: 3+3 rows. A all-1s, B all-2s, C one of each.
    val df = Seq(("A", 1L), ("A", 1L), ("B", 2L), ("B", 2L),
      ("C", 1L), ("C", 2L)).toDF("g", "v")
    val out = RelationalOps.tCloseness(df, Seq("g"), "v", tPpm = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // m=2, tot=6, cq=[3,6]. A: ng=2, cp=[2,2] -> |2*6-3*2| + |2*6-6*2| = 6
    //   t = 1e6*6 // (1*2*6) = 500000. B: cp=[0,2] -> |0-6| + 0 = 6 -> 500000.
    // C: cp=[1,2] -> |6-6| + |12-12| = 0.
    assert(out == Map("A" -> ((2L, 500000L, false)),
      "B" -> ((2L, 500000L, false)), "C" -> ((2L, 0L, true))), s"got: $out")
  }

  test("tCloseness rejects NULL sensitive values loudly") {
    val df = Seq(("A", java.lang.Long.valueOf(1L)), ("A", null))
      .toDF("g", "v")
    val ex = intercept[Exception](
      RelationalOps.tCloseness(df, Seq("g"), "v", tPpm = 1L).collect())
    assert(ex.getMessage != null)
  }

  test("lDiversity: distinct sensitive values gate the group; NULL is a value") {
    val df = Seq[(String, java.lang.Long)](
      // group a: 4 rows but only 2 distinct sensitive values -> fails l=3
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 2L),
      // group b: 3 rows, values {1, 2, NULL} -> NULL counts, passes l=3
      ("b", 1L), ("b", 2L), ("b", null),
      // group c: all NULL -> one distinct value
      ("c", null), ("c", null))
      .toDF("g", "s")
    val out = RelationalOps.lDiversity(df, Seq("g"), "s", l = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out == Map("a" -> ((4L, 2L, false)), "b" -> ((3L, 3L, true)),
      "c" -> ((2L, 1L, false))), s"got: $out")
  }

  test("ksStatistic: hand-computed two-sample KS; other groups ignored; partition-invariant") {
    // A = {1, 2}, B = {2, 3}: max |F_a - F_b| = 0.5 -> 5000 bp
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0),
      ("z", 99.0)).toDF("g", "v")
    val r = RelationalOps.ksStatistic(df, "g", "v", "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(r == ((2L, 2L, 5000L)), s"got $r")
    val r7 = RelationalOps.ksStatistic(df.repartition(7), "g", "v", "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(r7 == r, "KS must not depend on partitioning")
    // identical distributions -> 0
    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0)).toDF("g", "v")
    assert(RelationalOps.ksStatistic(same, "g", "v", "a", "b")
      .as[(Long, Long, Long)].collect().head._3 == 0L)
    // degenerate corpora: neither group present, and one group present —
    // the contract is EXACTLY ONE (n_a, n_b, 0) row, never an empty
    // relation (the oracle twin's ungrouped-aggregate form pins the same)
    val none = Seq(("z", 1.0)).toDF("g", "v")
    assert(RelationalOps.ksStatistic(none, "g", "v", "a", "b")
      .as[(Long, Long, Long)].collect().toSeq == Seq((0L, 0L, 0L)))
    val oneSide = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(RelationalOps.ksStatistic(oneSide, "g", "v", "a", "b")
      .as[(Long, Long, Long)].collect().toSeq == Seq((2L, 0L, 0L)))
  }

  test("chiSquare: independence -> 0; hand-computed 2x2; zero-observed cells carry expected mass") {
    // perfectly independent 2x2 (all margins equal): chi2 = 0
    val indep = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    assert(RelationalOps.chiSquare(indep, "x", "y")
      .as[(Long, Long, Long)].collect().head == ((4L, 1L, 0L)))
    // diagonal-only 2x2: N=4, every cell |O*N - R*C| = 4 -> term = 16e6/(2*2*4)
    // x4 cells = 4e6 (chi2 = 4 = N, the perfect-association value)
    val dep = Seq(("a", "u"), ("a", "u"), ("b", "v"), ("b", "v")).toDF("x", "y")
    val r = RelationalOps.chiSquare(dep, "x", "y")
      .as[(Long, Long, Long)].collect().head
    assert(r == ((4L, 1L, 4000000L)), s"got $r")
    // the zero-observed off-diagonal cells MUST contribute — dropping them
    // would halve the statistic; also partition-invariant
    assert(RelationalOps.chiSquare(dep.repartition(5), "x", "y")
      .as[(Long, Long, Long)].collect().head == r)
  }

  test("giniIndex: equality -> 0; single-holder -> (n-1)/n; tied blocks handled exactly") {
    val equal = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    assert(RelationalOps.giniIndex(equal, "v")
      .as[(Long, Long, Long)].collect().head == ((4L, 2000L, 0L)))
    val concentrated = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    assert(RelationalOps.giniIndex(concentrated, "v")
      .as[(Long, Long, Long)].collect().head == ((4L, 1000L, 750000L)))
    // mixed ties: {1, 1, 2}: G = (2*(1*1 + 2*1 + 3*2) - 4*4) / (3*4) = 1/6
    val mixed = Seq(1.0, 1.0, 2.0).toDF("v")
    assert(RelationalOps.giniIndex(mixed, "v")
      .as[(Long, Long, Long)].collect().head == ((3L, 400L, 166666L)))
  }

  test("woePanel: hand-computed smoothed WOE/IV; uninformative bins ~0; null bins drop, null labels negative") {
    // bin 0: 3 pos / 1 neg, bin 1: 1 pos / 3 neg (B=2, tp=4, tn=4)
    val df = Seq((0L, true), (0L, true), (0L, true), (0L, false),
      (1L, true), (1L, false), (1L, false), (1L, false)).toDF("bin", "pos")
    val got = RelationalOps.woePanel(df, col("bin"), col("pos"))
      .orderBy("bin").as[(Long, Long, Long, Long, Long)].collect().toSeq
    def woe(np: Long, nn: Long): Long =
      math.rint(math.log((np + 1.0) * 6.0 / ((nn + 1.0) * 6.0)) * 1e6).toLong
    def iv(np: Long, nn: Long): Long =
      math.rint(((np + 1.0) / 6.0 - (nn + 1.0) / 6.0) *
        math.log((np + 1.0) * 6.0 / ((nn + 1.0) * 6.0)) * 1e6).toLong
    assert(got == Seq((0L, 3L, 1L, woe(3, 1), iv(3, 1)),
      (1L, 1L, 3L, woe(1, 3), iv(1, 3))))
    assert(got(0)._4 == -got(1)._4, "symmetric fixture has mirrored WOE")
    assert(got.map(_._5).forall(_ > 0), "IV contributions are nonnegative")

    // label-independent bins: WOE = 0 exactly (equal smoothed shares)
    val flat = Seq((0L, true), (0L, false), (1L, true), (1L, false))
      .toDF("bin", "pos")
    assert(RelationalOps.woePanel(flat, col("bin"), col("pos"))
      .agg(max(abs(col("woe_micro"))), max(abs(col("iv_micro"))))
      .as[(Long, Long)].collect().head == ((0L, 0L)))

    // null bin rows vanish; null label counts into n_neg
    val edge = Seq((Some(0L), Some(true)), (None, Some(true)),
      (Some(0L), None)).toDF("bin", "pos")
    val e = RelationalOps.woePanel(edge, col("bin"), col("pos"))
      .select("bin", "n_pos", "n_neg").as[(Long, Long, Long)].collect().toSeq
    assert(e == Seq((0L, 1L, 1L)))
  }

  test("calibrationPanel: exact per-bin means/rates/contributions; top bin absorbs score 10000; nulls drop") {
    // bin width 1000 (10 bins): scores 500,700 -> bin 0; 9500,10000 -> bin 9
    val df = Seq((500L, true), (700L, false), (9500L, true), (10000L, true),
      (10000L, false)).toDF("s", "y")
    val got = RelationalOps.calibrationPanel(df, col("s"), col("y"))
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bin 0: n=2, mean=(500+700)/2=600, obs=(10000*1)/2=5000, |600-5000|*2
    // bin 9: n=3, mean=(9500+20000)/3=9833, obs=(10000*2)/3=6666
    assert(got == Seq(
      (0L, 2L, 600L, 5000L, 8800L),
      (9L, 3L, 9833L, 6666L, (9833L - 6666L) * 3L)))
    val withNull = Seq((Some(100L), Some(true)), (None, Some(true)),
      (Some(200L), None)).toDF("s", "y")
    assert(RelationalOps.calibrationPanel(withNull, col("s"), col("y"))
      .agg(sum("n")).as[Long].collect().head == 1L)
  }

  test("powerSampleSize: exact variance, ceiling division, scale sanity (4x smaller MDE -> 16x n)") {
    // values 10, 20, 30, 40 cents: mean 25, var = (4·3000 − 100²)/(4·3) = 166
    val df = Seq(10L, 20L, 30L, 40L).toDF("cents")
    val r = RelationalOps.powerSampleSize(df, col("cents"), mdeCents = 2L)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 25L, 166L, 2L)))
    val zz2 = 2L * RelationalOps.PowerZSumSqMicro
    val den = 2L * 2L * 1000000L
    assert(r.getLong(4) == (zz2 * 166L + den - 1) / den,
      "ceiling of 2·(z_a+z_b)²·σ²/Δ²")
    val r8 = RelationalOps.powerSampleSize(df, col("cents"), mdeCents = 8L)
      .collect()(0)
    // quadratic law within integer flooring: a 4x larger MDE needs ~16x less
    assert(math.abs(r.getLong(4) - 16L * r8.getLong(4)) <= 16L)
  }

  test("postStratifiedMean: reweighting corrects composition shift exactly; matched-strata contract") {
    // current sample over-represents stratum a (3:1); reference is 1:1.
    // means: a=100, b=200 -> naive favours a; post-stratified = 150.
    val cur = Seq(("a", 100L), ("a", 100L), ("a", 100L), ("b", 200L))
      .toDF("st", "x")
    val ref = Seq("a", "b", "a", "b").toDF("st")
    val r = RelationalOps.postStratifiedMean(cur, col("st"), col("x"),
      ref, col("st")).as[(Long, Long, Long)].collect().head
    assert(r == ((4L, 12500L, 15000L)),
      s"naive 125.00, post-stratified exactly 150.00: $r")
    // strata missing from the reference drop (no weight exists for them)
    val refA = Seq("a").toDF("st")
    val r2 = RelationalOps.postStratifiedMean(cur, col("st"), col("x"),
      refA, col("st")).as[(Long, Long, Long)].collect().head
    assert(r2 == ((3L, 10000L, 10000L)))
  }

  test("conformalUpperBound: exact order-statistic rank, measured coverage, tiny-set NULL branch") {
    // ids chosen so knuthHash(id,100) splits deterministically; recompute
    // the split in the test to stay honest to the hash
    def isCal(id: Long): Boolean = ((id % 1000003L) * 2654435761L) % 100L < 50L
    val rows = (1L to 400L).map(i => (i, i * 3L)) // value = 3·id cents
    val df = rows.toDF("id", "cents")
    val out = RelationalOps.conformalUpperBound(df, col("id"),
      col("cents"), levelBp = 9000L).collect()(0)
    val calVals = rows.filter(r => isCal(r._1)).map(_._2).sorted
    val k = ((calVals.size + 1) * 9000L + 9999L) / 10000L
    assert(out.getLong(0) == calVals.size && out.getLong(1) == k)
    assert(out.getLong(2) == calVals(k.toInt - 1),
      "threshold = k-th smallest calibration value")
    val evVals = rows.filterNot(r => isCal(r._1)).map(_._2)
    val cov = evVals.count(_ <= calVals(k.toInt - 1)) * 10000L / evVals.size
    assert(out.getLong(4) == cov)
    // guarantee direction: coverage at least near the level on iid halves
    assert(out.getLong(4) >= 8500L, s"coverage ${out.getLong(4)}")

    // calibration set so small that ceil((n+1)·level) exceeds n -> NULL
    val tiny = Seq((2L, 10L), (4L, 20L)).toDF("id", "cents") // both hash < 50
    val t = RelationalOps.conformalUpperBound(tiny, col("id"), col("cents"))
      .collect()(0)
    assert(t.isNullAt(2) && t.getLong(4) == 0L,
      s"rank ${t.getLong(1)} of ${t.getLong(0)} must yield NULL threshold")
  }

  test("targetEncode: exact LOO values, prior pull on singletons, null-category drop") {
    // cat a: y = [1, 1, 0]; cat b: y = [0]; global rate = 2/4 = 500000
    val df = Seq((1L, "a", true), (2L, "a", true), (3L, "a", false),
      (4L, "b", false)).toDF("id", "cat", "y")
    val te = RelationalOps.targetEncode(df, col("id"), col("cat"), col("y"),
        priorWeight = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // row1: (2-1)*1e6 + 2*500000 over (3-1+2) = 2e6/4
    assert(te(1L) == 500000L && te(2L) == 500000L)
    // row3: (2-0)*1e6 + 1e6 over 4
    assert(te(3L) == 750000L)
    // singleton cat b: LOO leaves nothing -> pure prior: (0 + 1e6) / 2
    assert(te(4L) == 500000L)
    // leakage check: row3's encoding never saw its own label — flipping it
    // moves ONLY via the global rate, not the category sum
    val flipped = Seq((1L, "a", true), (2L, "a", true), (3L, "a", true),
      (4L, "b", false)).toDF("id", "cat", "y")
    val te2 = RelationalOps.targetEncode(flipped, col("id"), col("cat"),
        col("y"), priorWeight = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // cat-a sum minus own label unchanged for row3 (2 either way); only the
    // global rate moved 500000 -> 750000
    assert(te2(3L) == (2L * 1000000L + 2L * 750000L) / 4L)
    // null categories produce no row
    val withNull = Seq((1L, Some("a"), true), (2L, None, true))
      .toDF("id", "cat", "y")
    assert(RelationalOps.targetEncode(withNull, col("id"), col("cat"),
      col("y")).count() == 1L)
  }

  // ---- fdProfile ----

  test("fdProfile: hand-computed g3, NULL is a value of its own, multi-pair panel") {
    // l=a: {1,1,2} violating (keep 2); l=b: {1,1} holds; l=NULL: {1,2}
    // violating (keep 1) → keep 5 of 7, g3 = ⌊10000·2/7⌋ = 2857
    val df = Seq((Some("a"), 1), (Some("a"), 1), (Some("a"), 2),
      (Some("b"), 1), (Some("b"), 1), (None, 1), (None, 2))
      .toDF("l", "r")
      .withColumn("k", monotonically_increasing_id()) // a trivially-held pair
    val out = RelationalOps.fdProfile(df, Seq(("l", "r"), ("k", "r")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out("l->r") == ((7L, 3L, 2L, 2857L, false)), s"got: ${out("l->r")}")
    assert(out("k->r") == ((7L, 7L, 0L, 0L, true)), s"got: ${out("k->r")}")
  }

  // ---- mannWhitneyU ----

  test("mannWhitneyU: hand-computed tie-corrected z on a 5-row pooled sample") {
    // A = {1, 2, 2}, B = {2, 3}: midranks 1, 3, 3, 3, 5 → R_A = 7,
    // U_A = 7 − 3·4/2 = 1; ties Σ(t³−t) = 24;
    // Var = (3·2/12)·(6 − 24/20) = 2.4; z = (1−3)/√2.4 = −1.2910
    val df = Seq((1L, true), (2L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "flag")
    val r = RelationalOps.mannWhitneyU(df, col("v"), col("flag")).collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0, s"U_A: ${r.getDouble(2)}")
    assert(r.getDouble(3) == -1.291, s"z: ${r.getDouble(3)}")
  }

  test("mannWhitneyU: swapping the flag negates z; identical samples give z = 0") {
    val df = (1L to 200L).map(i => (i * 7 % 97, i % 3 == 0)).toDF("v", "flag")
    val za = RelationalOps.mannWhitneyU(df, col("v"), col("flag"))
      .collect()(0).getDouble(3)
    val zb = RelationalOps.mannWhitneyU(df, col("v"), !col("flag"))
      .collect()(0).getDouble(3)
    assert(za == -zb, s"$za vs $zb")
    // same distribution in both arms: interleave identical values
    val same = (1L to 100L).flatMap(v => Seq((v, true), (v, false)))
      .toDF("v", "flag")
    val z0 = RelationalOps.mannWhitneyU(same, col("v"), col("flag"))
      .collect()(0).getDouble(3)
    assert(z0 == 0.0, s"z: $z0")
  }

  // ---- ldpFrequency ----

  private def ldpDomain = Seq("a", "b", "c", "d", "e").toDF("cat")

  test("ldpFrequency: debiased estimates sum to n exactly and track planted truth") {
    // k-RR algebra: Σ n̂ = n·(1 − k·q)/(p − q) = n for any p — the
    // estimator redistributes, never creates mass
    val rows = (1L to 2000L).map(i =>
      (i, Seq("a", "a", "a", "b", "c")((i % 5).toInt))).toDF("id", "cat")
    val out = RelationalOps.ldpFrequency(rows, "id", "cat", ldpDomain,
        pMicro = 750000L, releaseNonce = "spec-nonce-1")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out.keySet == Set("a", "b", "c", "d", "e"))
    val estSum = out.values.map(_._2).sum
    assert(math.abs(estSum - 2000.0) < 0.01, s"Σest: $estSum")
    assert(out.values.map(_._1).sum == 2000L, "reported histogram preserves n")
    // truth: a=1200, b=400, c=400, d=0, e=0 — estimates within ±10% of n
    assert(math.abs(out("a")._2 - 1200.0) < 200.0, s"a: ${out("a")}")
    assert(math.abs(out("d")._2 - 0.0) < 200.0, s"d: ${out("d")}")
  }

  test("ldpFrequency: near-1 keep probability reproduces the truth; nonce changes the draw; out-of-domain rows drop") {
    val rows = (1L to 500L).map(i =>
      (i, if (i % 4 == 0L) "b" else "a")).toDF("id", "cat")
    val exact = RelationalOps.ldpFrequency(rows, "id", "cat", ldpDomain,
        pMicro = 999999L, releaseNonce = "spec-nonce-2")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // p = 0.999999: w.h.p. every row keeps its true category
    assert(exact("a") == 375L && exact("b") == 125L, s"got: $exact")
    val r1 = RelationalOps.ldpFrequency(rows, "id", "cat", ldpDomain,
      pMicro = 600000L, releaseNonce = "n1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r1b = RelationalOps.ldpFrequency(rows, "id", "cat", ldpDomain,
      pMicro = 600000L, releaseNonce = "n1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = RelationalOps.ldpFrequency(rows, "id", "cat", ldpDomain,
      pMicro = 600000L, releaseNonce = "n2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 == r1b, "same nonce must replay bit-identically")
    assert(r1 != r2, "a fresh nonce must draw fresh perturbations")
    // out-of-domain category contributes nothing
    val withJunk = rows.union(Seq((9001L, "zzz")).toDF("id", "cat"))
    val n = RelationalOps.ldpFrequency(withJunk, "id", "cat", ldpDomain,
      pMicro = 750000L, releaseNonce = "n3")
      .agg(sum("n_reported")).collect()(0).getLong(0)
    assert(n == 500L, s"junk category must be excluded, got n=$n")
  }

  test("inclusionProfile: containment ppm and the pass flag") {
    import spark.implicits._
    val l = Seq(1L, 2L, 2L, 3L).toDF("k")
    val r = Seq(1L, 2L).toDF("k")
    val out = RelationalOps.inclusionProfile(Seq(
        ("l<r", l, "k", r, "k"), ("r<l", r, "k", l, "k")))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("l<r", 3L, 2L, 666666L, false),
      ("r<l", 2L, 2L, 1000000L, true)), out.toSeq.toString)
  }

  test("inclusionProfile: an all-NULL lhs reports NULL containment, " +
      "no ANSI division error") {
    import spark.implicits._
    val l = Seq[Option[Long]](None, None).toDF("k")
    val r = Seq(1L, 2L).toDF("k")
    val row = RelationalOps.inclusionProfile(Seq(("empty<r", l, "k", r, "k")))
      .collect()(0)
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L, row.toString)
    assert(row.isNullAt(3), row.toString)
    assert(row.getBoolean(4), row.toString) // vacuously contained
  }

  test("srmCheck: 60/40 on a 1:1 split fires; unexpected variants count") {
    import spark.implicits._
    val df = (Seq.fill(60)("v0") ++ Seq.fill(40)("v1") ++ Seq.fill(5)("vX"))
      .toDF("variant")
    val r = RelationalOps.srmCheck(df, "variant",
      Seq(("v0", 1L), ("v1", 1L)), critMicro = 3841500L).collect()(0)
    // chi2 = (60-50)^2/50 + (40-50)^2/50 = 4; vX is outside the design
    assert(r.getLong(0) == 100L && r.getLong(1) == 2L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 4.0 && r.getBoolean(4), r.toString)
    val ok = (Seq.fill(50)("v0") ++ Seq.fill(50)("v1")).toDF("variant")
    val r2 = RelationalOps.srmCheck(ok, "variant",
      Seq(("v0", 1L), ("v1", 1L)), critMicro = 3841500L).collect()(0)
    assert(r2.getDouble(3) == 0.0 && !r2.getBoolean(4), r2.toString)
  }

  test("srmCheck: an expected-but-unobserved variant still contributes") {
    import spark.implicits._
    val df = Seq.fill(50)("v0").toDF("variant")
    val r = RelationalOps.srmCheck(df, "variant",
      Seq(("v0", 1L), ("v1", 1L)), critMicro = 3841500L).collect()(0)
    // all 50 in one arm of a 1:1: chi2 = 25^2/25 + 25^2/25 = 50
    assert(r.getLong(1) == 2L && r.getDouble(3) == 50.0 && r.getBoolean(4),
      r.toString)
  }

  test("overlapTv: identical distributions overlap 1, disjoint overlap 0") {
    import spark.implicits._
    val same = Seq((1L, true), (1L, false), (2L, true), (2L, false))
      .toDF("b", "g")
    val r1 = RelationalOps.overlapTv(same, col("b"), col("g")).collect()(0)
    assert(r1.getDouble(3) == 0.0 && r1.getDouble(4) == 1.0, r1.toString)
    val disj = Seq((1L, true), (1L, true), (2L, false), (2L, false))
      .toDF("b", "g")
    val r2 = RelationalOps.overlapTv(disj, col("b"), col("g")).collect()(0)
    assert(r2.getDouble(3) == 1.0 && r2.getDouble(4) == 0.0, r2.toString)
  }

  test("overlapTv: an empty group yields NULL tv/overlap, never NaN") {
    import spark.implicits._
    val oneSided = Seq((1L, true), (2L, true)).toDF("b", "g")
    val r = RelationalOps.overlapTv(oneSided, col("b"), col("g")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L, r.toString)
    assert(r.isNullAt(3) && r.isNullAt(4), r.toString)
  }

  test("skyline2d: dominated points drop, duplicate frontier points count") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (1L, 3L), (2L, 7L), (2L, 7L), (3L, 7L),
      (4L, 2L)).toDF("price", "size")
    val out = RelationalOps.skyline2d(pts, col("price"), col("size"))
      .orderBy("min_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (1,3) dominated by (1,5); (3,7) by (2,7) (equal y, dearer);
    // (4,2) by everything
    assert(out.toSeq == Seq((1L, 5L, 1L), (2L, 7L, 2L)), out.toSeq.toString)
  }

  test("srmCheck: an empty frame reports n=0 without an ANSI divide error") {
    import spark.implicits._
    val r = RelationalOps.srmCheck(Seq.empty[String].toDF("variant"),
      "variant", Seq(("v0", 1L), ("v1", 1L)), critMicro = 3841500L)
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getDouble(3) == 0.0 && !r.getBoolean(4),
      r.toString)
  }
}

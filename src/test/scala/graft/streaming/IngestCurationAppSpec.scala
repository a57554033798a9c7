package graft.streaming

import graft.SparkSpec
import graft.apps.IngestCurationApp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, round}

/** The end-to-end ingest composition: corrupt lines to the DLQ, the
  * curation gate (quality/language/sampling/dedup) on the clean side,
  * survivors landing as deterministic training shards. */
class IngestCurationAppSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("feed splits into shards + DLQ; the gate drops junk; shards are deterministic") {
    val goodText = "the quick brown fox jumps over the lazy dog and runs far away home"
    val in = MemoryStream[String]
    in.addData(
      s"""{"doc_id": 1, "text": "$goodText", "ts": "2026-01-01T00:00:00"}""",
      s"""{"doc_id": 2, "text": "$goodText now with more words", "ts": "2026-01-01T00:00:01"}""",
      s"""{"doc_id": 2, "text": "$goodText now with more words", "ts": "2026-01-01T00:00:01"}""", // dup id
      s"""{"doc_id": 9, "text": "$goodText", "ts": "2026-01-01T00:00:05"}""",                     // new id, SAME content as doc 1
      """{"doc_id": 3, "text": "!!! ??? ### $$$ %%% @@@ !!! ??? ###", "ts": "2026-01-01T00:00:02"}""", // junk quality
      """{"doc_id": 4, "text": null, "ts": "2026-01-01T00:00:03"}""",                             // null text -> langid fails gate
      """{"doc_id": 5, "ts": "2026-01-01T00:00:04"""",                                            // malformed json
      """not json at all""")
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val q = IngestCurationApp.run(spark, in.toDF(), base,
      minQuality = 0.3, lang = "en", keepPct = 100, numShards = 4)
    q.processAllAvailable()

    val dlq = spark.read.parquet(s"$base/dlq").select("raw_value").as[String].collect()
    assert(dlq.length == 2, s"exactly the two malformed lines route to the DLQ: ${dlq.toSeq}")
    assert(dlq.exists(_.contains("not json")))

    val shards = spark.read.parquet(s"$base/shards")
    val kept = shards.select("doc_id").as[Long].collect().sorted.toSeq
    // doc 9 duplicates doc 1's CONTENT under a new id — the fingerprint
    // dedup drops it and the smallest id survives
    assert(kept == Seq(1L, 2L),
      s"gate keeps the two quality English docs once each: $kept")
    // shard assignment matches the deterministic operator
    val expected = graft.operators.Outputs.shardAssignments(
      shards.select("doc_id"), "doc_id", 4).select(col("doc_id"), col("shard_id"))
    assert(shards.select("doc_id", "shard_id").exceptAll(expected).isEmpty)

    // a LATER batch re-delivering doc 1 (same id+content), re-delivering
    // doc 2 with EDITED text (same id, new content), and duplicating
    // doc 2's original content under a fresh id ships none of them — the
    // stored (fp, doc_id) index catches cross-epoch dups on BOTH axes —
    // while genuinely new content under a new id still lands
    in.addData(
      s"""{"doc_id": 1, "text": "$goodText", "ts": "2026-01-01T00:01:00"}""",
      s"""{"doc_id": 2, "text": "$goodText edited second version of the document", "ts": "2026-01-01T00:01:01"}""",
      s"""{"doc_id": 7, "text": "$goodText now with more words", "ts": "2026-01-01T00:01:02"}""",
      s"""{"doc_id": 8, "text": "$goodText and this copy is genuinely fresh text", "ts": "2026-01-01T00:01:03"}""")
    q.processAllAvailable(); q.stop()
    val kept2 = spark.read.parquet(s"$base/shards")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(1L, 2L, 8L),
      s"only the fresh-content doc lands in the second epoch: $kept2")
    // ... and doc 2 exists exactly once with its ORIGINAL text (the edit
    // never replaced it)
    val doc2 = spark.read.parquet(s"$base/shards")
      .filter(col("doc_id") === 2L).select("text").as[String].collect()
    assert(doc2.toSeq == Seq(s"$goodText now with more words"),
      s"doc 2 ships once, original content: ${doc2.toSeq}")
  }

  test("stored HLL corpus stats survive a restart and equal the whole-corpus sketch") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away"
    val in = MemoryStream[String]
    val out = java.nio.file.Files.createTempDirectory("ingest-hll").toString
    def doc(id: Long, tag: String, t: String) =
      s"""{"doc_id": $id, "text": "$base $tag", "ts": "$t"}"""
    def start() = IngestCurationApp.run(spark, in.toDF(), out,
      minQuality = 0.3, lang = "en", keepPct = 100, numShards = 4)

    val q1 = start()
    in.addData((1L to 6L).map(i =>
      doc(i, s"variant number $i", s"2026-01-01T00:00:0$i")): _*)
    q1.processAllAvailable()
    q1.stop()
    // second incarnation, same checkpoint + same stored artifact
    val q2 = start()
    in.addData((7L to 9L).map(i =>
      doc(i, s"later variant $i entirely", s"2026-01-01T00:01:0${i - 6}")): _*)
    q2.processAllAvailable()
    q2.stop()

    // the stored registers must equal the sketch built over EVERYTHING
    // the app ever shipped — counts survived the restart
    val stored = SketchMaintenance.dataRows(
      spark.read.parquet(s"$out/hllstats"))
    val shipped = spark.read.parquet(s"$out/shards")
      .select(col("lang_pred"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    assert(shipped.count() == 9, "fixture: all nine distinct docs ship")
    val whole = graft.operators.Sketches.hllBuild(shipped, "fp", "lang_pred")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.select("lang_pred", "bucket", "max_rank").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(regs(stored) == regs(whole),
      "post-restart stored registers must equal the whole-corpus sketch")
    val estStored = graft.operators.Sketches
      .hllEstimate(stored, "lang_pred").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val estWhole = graft.operators.Sketches
      .hllEstimate(whole, "lang_pred").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(estStored == estWhole && estStored.values.forall(_ > 0))

    // the stored QUALITY quantile sample survives the restart too:
    // estimates off the artifact equal a one-shot sketch over everything
    // shipped (the merge law) — p50/p99 shipped quality without
    // rescanning shards
    val qs = Seq(50, 99)
    def qrows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("grp", "q").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val storedQ = qrows(SketchMaintenance.quantileEstimate(
      spark.read.parquet(s"$out/qualquant"), qs))
    val shippedQ = spark.read.parquet(s"$out/shards")
      .select(col("lang_pred").as("grp"), col("doc_id"),
        round(col("quality") * 10000, 0).cast("long").as("q4"))
    val oneShot = qrows(graft.operators.Sketches.quantileSketch(
      shippedQ, "doc_id", "grp", col("q4"), k = 256, qs))
    assert(storedQ == oneShot && storedQ.head._5 == 9L,
      s"stored quality quantiles must equal the one-shot sketch:\n$storedQ\n$oneShot")
  }

  test("a bad keepPct refuses to start instead of failing the first batch") {
    val in = MemoryStream[String]
    val base = java.nio.file.Files.createTempDirectory("ingest-bad").toString
    intercept[IllegalArgumentException] {
      IngestCurationApp.run(spark, in.toDF(), base,
        minQuality = 0.3, lang = "en", keepPct = 150, numShards = 4)
    }
  }
}

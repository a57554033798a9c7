package graft.streaming

import graft.SparkSpec
import graft.apps.WikipediaStagedTopology
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** §3.2's staged topology (three StreamingQueries chained through
  * materialized topic-shaped boundaries) must compute exactly what the
  * fused single-query plan computes — the parity that lets a reference
  * user pick either deployment shape. */
class WikipediaStagedSpec extends SparkSpec {

  private val rawJson = "/root/reference/wikipedia-raw.json"

  private def decodedFeed(linesPerBatch: Int) =
    Sources.replayFeed(spark, rawJson, linesPerBatch = linesPerBatch)
      .select(from_json(col("value"), WikipediaStagedTopology.RawSchema).as("m"))
      .select(col("m.*"))

  test("staged raw→parse→stats equals the fused pipeline row for row") {
    val root = java.nio.file.Files.createTempDirectory("wiki-staged").toString

    // FUSED reference result: single-batch feed (2000 ≥ the file's 1000
    // lines), so update mode emits exactly one FINAL row per window.
    val fused = Pipelines.wikipediaStats(decodedFeed(2000), "1 hour",
        watermark = "1 second")
      .writeStream.format("memory").queryName("w_fused").outputMode("update")
      .start()
    fused.processAllAvailable(); fused.stop()

    // STAGED: three queries, run to completion in topology order. Stage 1
    // deliberately feeds in 4 batches (250 lines each) — the boundary
    // materialization is incremental, not a one-shot copy.
    val q1 = WikipediaStagedTopology.feedStage(decodedFeed(250),
      s"$root/wikipedia-raw", s"$root/ck-feed")
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$root/wikipedia-raw").count() == 1000,
      "stage 1 must land every raw event in the topic dir")

    val q2 = WikipediaStagedTopology.parseStage(spark,
      s"$root/wikipedia-raw", s"$root/wikipedia-edits", s"$root/ck-parse")
    q2.processAllAvailable(); q2.stop()

    val q3 = WikipediaStagedTopology.statsStage(spark,
        s"$root/wikipedia-edits", "1 hour", watermark = "1 second")
      .writeStream.format("memory").queryName("w_staged").outputMode("update")
      .start()
    q3.processAllAvailable(); q3.stop()

    // With all boundary files present before stage 3 starts, the file
    // source takes them in one batch — one final row per window, directly
    // comparable to the fused run's.
    val fusedRows = spark.table("w_fused").collect().map(_.toSeq).toSet
    val stagedRows = spark.table("w_staged").collect().map(_.toSeq).toSet
    assert(fusedRows.nonEmpty, "fused run must emit window aggregates")
    assert(stagedRows == fusedRows,
      s"staged != fused:\n staged-only=${stagedRows -- fusedRows}\n fused-only=${fusedRows -- stagedRows}")

    // the boundary really is topic-shaped: one string value column
    assert(spark.read.parquet(s"$root/wikipedia-edits").schema.map(_.name)
      == Seq("value"))
  }
}

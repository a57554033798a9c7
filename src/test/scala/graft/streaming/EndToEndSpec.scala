package graft.streaming

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Full chain S2 → P4 → W2: the custom DataSource V2 replay source feeds
  * the raw wikipedia-raw.json feed through JSON decode, regex parse, and
  * the windowed stats aggregation — the flagship pipeline end to end on
  * the engine's own ingest path (not the built-in file source). */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("replay source → parse → windowed stats over wikipedia-raw.json") {
    val feed = Sources.replayFeed(spark, "/root/reference/wikipedia-raw.json", linesPerBatch = 400)
      .select(from_json(col("value"),
        StructType.fromDDL("channel STRING, raw STRING, time LONG, source STRING")).as("m"))
      .select(col("m.*"))
    val q = Pipelines.wikipediaStats(feed, "1 hour", watermark = "1 second")
      .writeStream.format("memory").queryName("t_e2e").outputMode("update").start()
    q.processAllAvailable(); q.stop()

    val stats = spark.table("t_e2e")
    assert(stats.count() > 0, "pipeline must emit window aggregates")
    val maxEdits = stats.agg(max("edits")).as[Long].collect()(0)
    // wikipedia-raw.json has 1000 lines; nearly all parse, and update mode
    // re-emits the growing window — the final update carries the full count
    assert(maxEdits > 900 && maxEdits <= 1000, s"saw $maxEdits parsed edits")
    assert(stats.filter(col("byteDiff").isNull).count() == 0)
  }
}

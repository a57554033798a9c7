package graft.apps

import graft.streaming.{Pipelines, WikipediaParse}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructType}

/** §3.2's topology in its STAGED form. The reference runs wikipedia
  * raw→parse→stats as THREE Kafka-connected jobs — WikipediaFeedStreamTask
  * → WikipediaParserStreamTask → WikipediaStatsStreamTask, each pair
  * joined by a topic (/root/reference/src/main/java/samza/examples/
  * wikipedia/task/WikipediaParserStreamTask.java:38-44,
  * wikipedia-stats.properties:29). [[Pipelines.wikipediaStats]] proves the
  * FUSED single-query form of the same computation; this object
  * materializes the stage boundaries the way the reference does: each
  * stage is its own StreamingQuery, handing off through a durable
  * topic-shaped store — a single `value` string column (the Kafka message
  * shape) in rolled parquet files whose file-sink commit log gives the
  * downstream re-source exactly-once file discovery. Stages restart and
  * scale independently, which is the operational property the reference's
  * topology buys; `WikipediaStagedSpec` pins stage-chained output equal to
  * the fused plan's.
  */
object WikipediaStagedTopology {

  /** The raw-feed event shape (channel, raw, time, source) — the payload
    * WikipediaFeedStreamTask publishes to wikipedia-raw. */
  val RawSchema: StructType =
    StructType.fromDDL("channel STRING, raw STRING, time LONG, source STRING")

  private val topicSchema = new StructType().add("value", StringType)

  /** Parsed-edit boundary schema, derived from the parser itself (on an
    * empty frame), so the wikipedia-edits topic schema can never drift
    * from what [[WikipediaParse.parse]] actually emits. */
  def parsedSchema(spark: SparkSession): StructType =
    WikipediaParse.parse(spark.createDataFrame(
      new java.util.ArrayList[Row](), RawSchema)).schema

  /** Stage 1 — the feed job: raw events (channel, raw, time, source) →
    * the wikipedia-raw topic dir, one JSON `value` per event. */
  def feedStage(feed: DataFrame, rawTopicDir: String,
                checkpoint: String): StreamingQuery =
    feed
      .select(to_json(struct(col("channel"), col("raw"), col("time"),
        col("source"))).as("value"))
      .writeStream.format("parquet")
      .option("path", rawTopicDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  /** Stage 2 — the parser job: re-source wikipedia-raw, decode, parse
    * (P4), publish parsed edits to the wikipedia-edits topic dir. */
  def parseStage(spark: SparkSession, rawTopicDir: String,
                 editsTopicDir: String, checkpoint: String): StreamingQuery = {
    val raw = spark.readStream.schema(topicSchema).parquet(rawTopicDir)
      .select(from_json(col("value"), RawSchema).as("m"))
      .select(col("m.*"))
    WikipediaParse.parse(raw)
      .select(to_json(struct(col("*"))).as("value"))
      .writeStream.format("parquet")
      .option("path", editsTopicDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
  }

  /** Stage 3 — the stats job: re-source wikipedia-edits and run the
    * windowed aggregation. Returns the streaming frame; the caller picks
    * the sink (memory in tests, kafka/table in production). */
  def statsStage(spark: SparkSession, editsTopicDir: String,
                 windowLen: String = "10 seconds",
                 watermark: String = "10 seconds"): DataFrame = {
    val parsed = spark.readStream.schema(topicSchema).parquet(editsTopicDir)
      .select(from_json(col("value"), parsedSchema(spark)).as("e"))
      .select(col("e.*"))
    Pipelines.wikipediaStatsOverParsed(parsed, windowLen, watermark)
  }
}

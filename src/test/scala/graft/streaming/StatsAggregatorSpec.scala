package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed custom-fold Aggregator must agree with the equivalent
  * expression-based aggregation over the real fixture corpus. */
class StatsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("WikipediaStatsAggregator matches expression aggregation on the fixture feed") {
    val feed = spark.read
      .schema("channel STRING, raw STRING, time LONG, source STRING")
      .json("/root/reference/src/test/resources/WikipediaEditEvents.txt")
      .filter(col("raw").isNotNull && col("time").isNotNull)
    val edits = WikipediaParse.parse(feed)
      .select(col("title"), col("diffBytes").cast("long").as("diffBytes"), col("isMinor"))
      .as[EditEvent]

    val typed = edits.select(WikipediaStatsAggregator.toColumn).collect()(0)

    val expected = edits.agg(
      count(lit(1)).as("edits"),
      sum("diffBytes").as("byteDiff"),
      countDistinct("title").as("uniqueTitles"),
      sum(when(col("isMinor"), 1L).otherwise(0L)).as("minorEdits"))
      .as[(Long, Long, Long, Long)].collect()(0)

    assert((typed.edits, typed.byteDiff, typed.uniqueTitles, typed.minorEdits) == expected)
    assert(typed.edits == 882)
  }
}

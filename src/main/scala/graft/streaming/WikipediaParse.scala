package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The wikipedia IRC-line parser (SURVEY.md §2.3 P4) as pure column
  * expressions — codegen'd regexp_extract per field, no UDF.
  *
  * Line format (semantics per the reference parser,
  * /root/reference/src/main/java/samza/examples/wikipedia/task/
  * WikipediaParser.java:45-80):
  *
  *   [[<title>]] <flags> <diff-url> * <user> * (<±bytes>) <summary>
  *
  * Derived boolean flags: is-minor = flags contains 'M', is-new = 'N',
  * is-unpatrolled = '!', is-bot-edit = 'B' (WikipediaParser.java:59-64);
  * is-special / is-talk from the title prefix. Unparseable lines yield
  * null and are dropped (parity with parseLine's exception → null-drop,
  * WikipediaParser.java:36-42).
  *
  * Works identically on a batch DataFrame and a streaming one — the same
  * declarative plan incrementalizes under Structured Streaming.
  */
object WikipediaParse {

  /** One regex, six capture groups. */
  val LinePattern = """\[\[(.*)\]\]\s(.*)\s(.*)\s\*\s(.*)\s\*\s\(([+-]?\d+)\)\s(.*)"""

  private def g(c: Column, i: Int): Column = regexp_extract(c, LinePattern, i)

  /** raw feed (channel, raw, time, source) → parsed edit events.
    * `time` is epoch millis → event-time timestamp column `ts`. */
  def parse(feed: DataFrame): DataFrame = {
    val raw = col("raw")
    feed
      .filter(raw.rlike(LinePattern) && col("time").isNotNull)
      .select(
        g(raw, 1).as("title"),
        g(raw, 2).as("unparsedFlags"),
        g(raw, 3).as("diffUrl"),
        g(raw, 4).as("user"),
        g(raw, 5).cast("int").as("diffBytes"),
        g(raw, 6).as("summary"),
        col("channel"), col("source"),
        timestamp_millis(col("time")).as("ts"))
      .withColumn("isMinor", col("unparsedFlags").contains("M"))
      .withColumn("isNew", col("unparsedFlags").contains("N"))
      .withColumn("isUnpatrolled", col("unparsedFlags").contains("!"))
      .withColumn("isBotEdit", col("unparsedFlags").contains("B"))
      .withColumn("isSpecial", col("title").startsWith("Special:"))
      .withColumn("isTalk", col("title").startsWith("Talk:"))
  }
}

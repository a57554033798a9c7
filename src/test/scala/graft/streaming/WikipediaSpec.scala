package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Parser + full wikipedia pipeline over the reference's checked-in fixture
  * feeds (JSON-per-line raw events), read at test time from the read-only
  * reference checkout under src/test/resources of /root/reference;
  * see TestWikipediaApplication.java:39-80. */
class WikipediaSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val fixtureDir = "/root/reference/src/test/resources"

  private def loadFeed(name: String): Seq[WikipediaFeedEvent] =
    spark.read
      .schema("channel STRING, raw STRING, time LONG, source STRING")
      .json(s"$fixtureDir/$name")
      .filter(col("raw").isNotNull && col("time").isNotNull)
      .as[WikipediaFeedEvent]
      .collect().toSeq

  test("P4 parser extracts title/user/bytes/flags from a real fixture line (WikipediaParser.java:45-80)") {
    val feed = loadFeed("WikipediaEditEvents.txt")
    assert(feed.length == 882)
    val parsed = WikipediaParse.parse(feed.toDF())
    val rows = parsed.collect()
    assert(rows.nonEmpty && rows.length <= feed.length)
    // every parsed row has a title and an integer byte diff
    assert(parsed.filter(col("title").isNull || col("diffBytes").isNull).count() == 0)
    // flags derive from the unparsed flag string
    val minor = parsed.filter(col("isMinor")).select("unparsedFlags").as[String].collect()
    assert(minor.forall(_.contains("M")))
    // spot-check one well-formed line end-to-end
    val one = WikipediaParse.parse(Seq(WikipediaFeedEvent(
      "#en.wikipedia",
      "[[Fear Is the Key (song)]]  https://en.wikipedia.org/w/index.php?diff=865574761 * Sam Sailor * (+46) Redirecting",
      1540408899419L, "rc-pmtpa")).toDF()).collect()(0)
    assert(one.getAs[String]("title") == "Fear Is the Key (song)")
    assert(one.getAs[String]("user") == "Sam Sailor")
    assert(one.getAs[Int]("diffBytes") == 46)
  }

  test("parser drops unparseable lines (WikipediaParser.java:36-42)") {
    val junk = Seq(
      WikipediaFeedEvent("#en.wikipedia", "not an edit line", 1L, "s"),
      WikipediaFeedEvent("#en.wikipedia", "[[only title]]", 2L, "s"))
    assert(WikipediaParse.parse(junk.toDF()).count() == 0)
  }

  test("S3+W2 full pipeline: 3-channel merge, window aggregation over fixtures (TestWikipediaApplication.java:39-80)") {
    val all = loadFeed("WikipediaEditEvents.txt") ++
      loadFeed("WikinewsEditEvents.txt") ++
      loadFeed("WikitionaryEditEvents.txt")
    val in = MemoryStream[WikipediaFeedEvent]
    in.addData(all)
    // flush event far in the future closes every window
    in.addData(WikipediaFeedEvent("#en.wikipedia",
      "[[Flush]]  url * flusher * (+1) flush",
      all.map(_.time).max + 3600 * 1000L, "s"))
    val q = Pipelines.wikipediaStats(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("t_wiki").outputMode("append").start()
    q.processAllAvailable()
    in.addData(WikipediaFeedEvent("#en.wikipedia",
      "[[Flush2]]  url * flusher * (+1) flush",
      all.map(_.time).max + 7200 * 1000L, "s"))
    q.processAllAvailable(); q.stop()
    val stats = spark.table("t_wiki")
    assert(stats.count() > 0)
    val total = stats.agg(sum("edits")).as[Long].collect()(0)
    val parseable = WikipediaParse.parse(all.toDF()).count()
    // +1: the first flush event's own window is closed by the second flush
    assert(total == parseable + 1, s"window edits should sum to parsed events ($total vs $parseable + 1)")
    assert(stats.filter(col("byteDiff").isNull).count() == 0)
  }
}

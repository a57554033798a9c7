package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermark semantics: the engine's replacement for the reference's
  * unbounded processing-time state (SURVEY.md §4.2 — Samza has no
  * late-data handling; we bound state with event-time watermarks). */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("late events beyond the watermark are dropped from closed windows") {
    val in = MemoryStream[PageView]
    val q = Pipelines.tumblingUserCounts(in.toDS(), "10 seconds", watermark = "5 seconds")
      .writeStream.format("memory").queryName("t_late").outputMode("append").start()

    // batch 1: window [1000,1010) gets 2 events; watermark -> 1003
    in.addData(PageView("a", "u1", "x", ts(1005)), PageView("b", "u1", "x", ts(1008)))
    q.processAllAvailable()
    // batch 2: advance watermark far past the window end (2000-5 >> 1010)
    in.addData(PageView("c", "u2", "x", ts(2000)))
    q.processAllAvailable()
    // batch 3: a LATE event for the already-closed window — must be dropped
    in.addData(PageView("late", "u1", "x", ts(1001)))
    q.processAllAvailable()
    // batch 4: flush so any (incorrect) re-opened window would emit
    in.addData(PageView("d", "u3", "x", ts(3000)))
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("t_late").filter($"userId" === "u1")
      .select("count").as[Long].collect()
    assert(u1.toSeq == Seq(2L),
      s"closed window must count only the 2 on-time events, saw ${u1.toSeq}")
  }

  test("stream-stream left outer join emits unmatched views with nulls after the watermark") {
    val pv = MemoryStream[PageView]
    val ac = MemoryStream[AdClick]
    val q = Pipelines.pageViewAdClickLeftJoin(pv.toDS(), ac.toDS(), ttl = "10 seconds")
      .writeStream.format("memory").queryName("t_louter").outputMode("append").start()
    pv.addData(PageView("clicked.com", "u1", "x", ts(1000)),
      PageView("ignored.com", "u2", "x", ts(1001)))
    ac.addData(AdClick("clicked.com", "ad1", "u1", ts(1002)))
    q.processAllAvailable()
    // push BOTH watermarks far past the join bound so the unmatched view emits
    pv.addData(PageView("f", "u9", "x", ts(5000)))
    ac.addData(AdClick("f2", "ad9", "u9", ts(5000)))
    q.processAllAvailable()
    pv.addData(PageView("g", "u9", "x", ts(9000)))
    ac.addData(AdClick("g2", "ad9", "u9", ts(9000)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("t_louter")
      .filter(org.apache.spark.sql.functions.col("userId").isin("u1", "u2"))
      .select("userId", "adId").as[(String, Option[String])].collect().toMap
    assert(rows("u1").contains("ad1"), s"matched view keeps its ad, saw $rows")
    assert(rows("u2").isEmpty, s"unmatched view must emit with null adId, saw $rows")
  }
}

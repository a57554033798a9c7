package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exact sessionization and streaming dedup (stateful-API variants). */
class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("flatMapGroupsWithState sessionization closes sessions on event-time timeout") {
    val in = MemoryStream[PageView]
    val q = StatefulOps.sessionizeExact(in.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("t_fmgws").outputMode("append").start()
    // the 6-event fixture: user1 and user2, 3 views each within the gap
    in.addData(
      PageView("a", "user1", "x", ts(1000)), PageView("b", "user1", "x", ts(1002)),
      PageView("c", "user1", "x", ts(1004)),
      PageView("d", "user2", "x", ts(1001)), PageView("e", "user2", "x", ts(1003)),
      PageView("f", "user2", "x", ts(1005)))
    q.processAllAvailable()
    // advance the watermark far past both sessions' timeout
    in.addData(PageView("g", "user3", "x", ts(2000)))
    q.processAllAvailable()
    in.addData(PageView("h", "user3", "x", ts(3000)))
    q.processAllAvailable(); q.stop()
    val out = spark.table("t_fmgws").as[StatefulOps.SessionOut].collect()
      .filter(s => s.userId == "user1" || s.userId == "user2").sortBy(_.userId)
    assert(out.map(s => (s.userId, s.count)).toSeq == Seq(("user1", 3L), ("user2", 3L)),
      s"exactly 2 sessions of 3 views, saw ${out.toSeq}")
    assert(out.forall(_.durationMs == 4000L))
  }

  test("dropDuplicatesWithinWatermark removes repeated events in-stream") {
    val in = MemoryStream[PageView]
    val q = StatefulOps.dedupStream(in.toDS().toDF(), "ts", "10 seconds", Seq("pageId", "userId"))
      .writeStream.format("memory").queryName("t_dedup").outputMode("append").start()
    in.addData(
      PageView("p1", "u1", "x", ts(1000)),
      PageView("p1", "u1", "x", ts(1001)), // duplicate within watermark
      PageView("p2", "u1", "x", ts(1002)))
    q.processAllAvailable()
    in.addData(PageView("p1", "u1", "x", ts(1003))) // still duplicate
    q.processAllAvailable(); q.stop()
    val out = spark.table("t_dedup").select("pageId").as[String].collect().sorted
    assert(out.toSeq == Seq("p1", "p2"), s"saw ${out.toSeq}")
  }
}

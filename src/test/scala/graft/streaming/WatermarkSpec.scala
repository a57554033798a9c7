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
}
